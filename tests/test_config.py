"""YAML config system tests (baseui/src/config.rs parity)."""

from pathlib import Path

import pytest

from slamrs_tpu.graph.config import load_config, parse_config
from slamrs_tpu.graph.pubsub import PubSub

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


@pytest.mark.parametrize("name", [
    "grid_slam.yaml", "grid_slam_fused.yaml", "icp_test.yaml",
    "landmarks.yaml", "neato.yaml", "neato_grid_slam.yaml",
    "neato_replay.yaml", "shape_test.yaml"])
def test_presets_parse(name):
    cfg = load_config(CONFIG_DIR / name)
    assert cfg.nodes


@pytest.mark.parametrize("name", [
    "grid_slam.yaml", "icp_test.yaml", "landmarks.yaml", "shape_test.yaml",
    "neato.yaml", "neato_replay.yaml"])
def test_presets_instantiate(name):
    # RobotConnection instantiates without connecting (connect() is the
    # explicit live step), so the neato presets are safe to build
    cfg = load_config(CONFIG_DIR / name)
    nodes = cfg.instantiate_nodes(PubSub())
    assert len(nodes) == len(cfg.nodes)
    for n in nodes:
        n.terminate()


def test_unknown_tag_rejected():
    with pytest.raises(ValueError, match="unknown node type"):
        parse_config("nodes:\n- !NotANode {}\n")


def test_unknown_field_rejected():
    # deny_unknown_fields (config.rs:20)
    with pytest.raises(ValueError, match="unknown fields"):
        parse_config(
            "nodes:\n- !Controls {topic_command: c, bogus_field: 1}\n")


def test_nested_tags():
    cfg = parse_config("""
nodes:
- !Simulator
  topic_command: "c"
  scene:
  - !Rectangle {x: 0.0, y: 0.0, width: 1.0, height: 1.0}
  - !Line {x1: 0.0, y1: 0.0, x2: 1.0, y2: 1.0}
  landmarks:
  - !Landmark {x: 0.5, y: 0.5}
  parameters: {wheel_base: 0.2}
""")
    tag, sim = cfg.nodes[0]
    assert tag == "Simulator"
    scene = sim.build_scene()
    assert int(scene.segment_mask.sum()) == 5  # 4 rect sides + 1 line
    assert int(scene.landmark_mask.sum()) == 1


def test_icp_step_weights_tag():
    cfg = parse_config("""
nodes:
- !IcpPointMapper
  topic_pose: p
  topic_observation: o
  topic_pointmap: m
  icp:
    iterations: 7
    correspondence_weights: !Step {threshold: 0.05}
""")
    _, node = cfg.nodes[0]
    mc = node.mapper_config()
    assert mc.iterations == 7
    assert mc.step_threshold == pytest.approx(0.05)


def test_empty_config():
    assert parse_config("").nodes == []
