"""Recorded-data replay tests against the reference repo's real Neato
captures (read-only test fixtures; BASELINE config 4's replay path)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

DATA = Path("/root/reference/slamrs/baseui/data")

pytestmark = pytest.mark.skipif(not DATA.exists(),
                                reason="reference recordings not mounted")


def load(name):
    from slamrs_tpu.io.neato import load_neato_binary
    return load_neato_binary(DATA / name)


def test_parse_recorded_logs():
    for name, expected in (("out.bin", 71), ("out2.bin", 98),
                           ("out_.bin", 72)):
        frames = load(name)
        assert len(frames) == expected
        # every frame is a full 360-lane revolution
        assert all(f.distance.shape == (360,) for f in frames)


def test_icp_frontend_on_recorded_data():
    """ICP scan-to-map odometry over a real capture (the neato.yaml ICP
    path).  The robot was quasi-stationary in these recordings; the
    estimated trajectory must stay finite and small."""
    from slamrs_tpu.core.types import Scan
    from slamrs_tpu.models import icp_mapper as IM

    frames = load("out2.bin")[:12]
    cfg = IM.IcpMapConfig(capacity=16384, step_threshold=0.1)
    state = IM.IcpMapState.init(cfg)
    poses = []
    for f in frames:
        angles, dist, strength, valid, present = f.to_scan_arrays()
        scan = Scan(jnp.asarray(angles), jnp.asarray(dist),
                    jnp.asarray(strength), jnp.asarray(valid),
                    jnp.asarray(present))
        state, out = IM.update(state, scan, cfg)
        poses.append(np.asarray(out.pose))
    poses = np.stack(poses)
    assert np.isfinite(poses).all()
    assert int(state.count) > 400  # map accumulated real structure
    # quasi-stationary capture: drift stays bounded
    assert np.abs(poses[:, :2]).max() < 0.5, poses[:, :2].max()


def test_fileloader_node_replays(tmp_path):
    from slamrs_tpu.graph.app import App
    from slamrs_tpu.graph.config import parse_config
    from slamrs_tpu.graph.nodes.robot import FileLoaderNode

    cfg = parse_config(f"""
nodes:
- !FileLoader
  topic_observation: "robot/observation"
  topic_pose: "file/pose"
  path: "{DATA / 'out2.bin'}"
""")
    app = App(cfg)
    sub = app.pubsub.subscribe("robot/observation")
    app.run(frames=10)
    loader = app.node(FileLoaderNode)
    assert len(loader.frames) == 98
    msgs = sub.drain()
    assert len(msgs) == 10  # one frame per app frame (autoplay)
    assert msgs[0].distances.shape == (360,)
