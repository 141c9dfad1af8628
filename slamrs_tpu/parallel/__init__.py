from slamrs_tpu.parallel.fleet import (  # noqa: F401
    fleet_shardings,
    make_mesh,
    shard_world_state,
)
