from vitiq.utils.profiling import StepTimer, format_time, trace_context  # noqa: F401
