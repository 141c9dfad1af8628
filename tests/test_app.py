"""Host app + node graph integration tests."""

from pathlib import Path

import numpy as np
import pytest

from slamrs_tpu.graph.app import App
from slamrs_tpu.graph.nodes.sim import SimulatorNode
from slamrs_tpu.graph.nodes.slam import GridMapSlamNode
from slamrs_tpu.graph.nodes.viz import VisualizerNode

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def test_grid_slam_app_runs_and_publishes():
    app = App.from_file(str(CONFIG_DIR / "grid_slam.yaml"))
    app.run(duration_s=2.5)  # period 1.0s -> 2 scans
    sim = app.node(SimulatorNode)
    slam = app.node(GridMapSlamNode)
    viz = app.node(VisualizerNode)
    assert slam._updates >= 2
    pose = viz.latest("robot/pose")
    assert pose is not None
    true = sim.get_pose()
    assert np.linalg.norm(true[:2] - pose.pose[:2]) < 0.3
    m = viz.latest("slam/map")
    assert m is not None and m.data.shape == (200, 200)
    assert (m.data > 0.6).sum() > 50  # occupied structure appeared
    app.terminate()


def test_icp_app_runs(tmp_path):
    app = App.from_file(str(CONFIG_DIR / "icp_test.yaml"))
    app.run(duration_s=2.0)
    viz = app.node(VisualizerNode)
    pm = viz.latest("slam/map")
    assert pm is not None and len(pm.points) > 100
    # viz export paths work headlessly
    viz.save_npz(tmp_path / "out.npz")
    viz.render_png(tmp_path / "out.png")
    assert (tmp_path / "out.png").exists()
    app.terminate()


def test_scripted_controls_publish_on_change():
    from slamrs_tpu.graph.config import parse_config
    cfg = parse_config("""
nodes:
- !Controls
  topic_command: c
  script:
  - [0.5, 0.1, 0.1]
  - [999.0, 0.2, 0.2]
""")
    app = App(cfg)
    sub = app.pubsub.subscribe("c")
    app.run(frames=45)  # 1.5 s
    msgs = sub.drain()
    assert len(msgs) == 2  # one per change, not per frame
    assert float(msgs[0].speed_left) == pytest.approx(0.1)
    assert float(msgs[1].speed_left) == pytest.approx(0.2)
