from slamrs_tpu.utils.perf import PerfStats  # noqa: F401
