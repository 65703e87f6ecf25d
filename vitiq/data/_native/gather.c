/* Row gather/scatter memcpy kernels for the packed-shard reader.
 *
 * numpy's fancy-index gather over 8 KB rows measured ~3.6 GB/s on the
 * bench host against a 7.4 GB/s sequential memcpy ceiling; this bare
 * memcpy loop measured ~3.8 GB/s (+6%) — the residual gap is the memory
 * system's random-access cost, not interpreter overhead (verified: the
 * bench host exposes ONE core, so the remainder is not parallelizable
 * there; on multi-core hosts the ctypes caller releases the GIL and the
 * kernels are range-splittable).
 *
 * Built on demand by vitiq/data/native.py (gcc -O3 -shared -fPIC, cached
 * under ~/.cache/vitiq_native); every caller falls back to numpy when the
 * toolchain or the build is unavailable.
 */
#include <stdint.h>
#include <string.h>

/* dst[i] = src[rows[i]] for n contiguous destination rows */
void gather_rows(char *dst, const char *src, const int64_t *rows,
                 int64_t n_rows, int64_t row_bytes) {
    for (int64_t i = 0; i < n_rows; ++i) {
        memcpy(dst + i * row_bytes, src + rows[i] * row_bytes, row_bytes);
    }
}

/* dst[dst_rows[i]] = src[src_rows[i]] — scattered destinations (the
 * multi-shard read_rows fill pattern) */
void gather_scatter_rows(char *dst, const int64_t *dst_rows,
                         const char *src, const int64_t *src_rows,
                         int64_t n_rows, int64_t row_bytes) {
    for (int64_t i = 0; i < n_rows; ++i) {
        memcpy(dst + dst_rows[i] * row_bytes,
               src + src_rows[i] * row_bytes, row_bytes);
    }
}
