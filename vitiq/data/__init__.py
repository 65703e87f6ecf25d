from vitiq.data.synthetic import (  # noqa: F401
    ChannelModel,
    SyntheticAMCDataset,
    apply_channel,
    channel_from_config,
    generate_frames,
    generate_test_signal,
)
from vitiq.data.splits import SplitIndices, load_dataset_metadata, split_data, split_labels  # noqa: F401
from vitiq.data.stats import compute_normalization_stats, stats_from_array, stats_from_hdf5  # noqa: F401
from vitiq.data.hdf5 import HDF5DataSource, PackedDataSource, pack_split_to_npy  # noqa: F401
from vitiq.data.pipeline import Prefetcher, device_prefetch  # noqa: F401
from vitiq.data.feeds import ArrayFeed, DataFeed, StreamFeed, as_feed  # noqa: F401
