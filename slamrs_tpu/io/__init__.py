from slamrs_tpu.io import neato, message  # noqa: F401
