from slamrs_tpu.viz.shapes import Camera, Color, PrimitiveType, ShapeRenderer  # noqa: F401
