"""Behavior tests for the previously-stubbed nodes: gamepad teleop math,
ShapeTest/GaussianTest driving the shape renderer, the EKF correlation
heat-map, and the serial connection medium (pty-backed)."""

import math
import os

import numpy as np
import pytest

from slamrs_tpu.core.types import Command, Gaussian2D
from slamrs_tpu.graph.pubsub import PubSub
from slamrs_tpu.viz.shapes import ShapeRenderer


def test_gamepad_stick_to_differential():
    """gamepad.rs:79-103: full-forward stick -> equal wheel speeds;
    right-lean subtracts cos/damping from the right wheel."""
    from slamrs_tpu.graph.nodes.util import GamepadNode, GamepadNodeConfig

    ps = PubSub()
    node = GamepadNodeConfig(topic_command="cmd",
                             max_speed=0.5).instantiate(ps)
    sub = ps.subscribe("cmd", Command)

    node.set_stick(0.0, 1.0)  # full forward
    node.update()
    ps.tick()
    cmd = sub.try_recv()
    assert cmd is not None
    # angle=pi/2: sin=1, cos=0 -> both wheels = magnitude * speed
    assert float(cmd.speed_left) == pytest.approx(0.5, abs=1e-6)
    assert float(cmd.speed_right) == pytest.approx(0.5, abs=1e-6)

    node.set_stick(1.0, 1.0)  # forward-right diagonal
    node.update()
    ps.tick()
    cmd = sub.try_recv()
    a = math.atan2(1.0, 1.0)
    mag = math.hypot(1, 1) / (math.hypot(1, 1) / 1.0)  # = 1 on square pad
    el = mag * (math.sin(a) + math.cos(a) / 3.0) * 0.5
    er = mag * (math.sin(a) - math.cos(a) / 3.0) * 0.5
    assert float(cmd.speed_left) == pytest.approx(el, abs=1e-6)
    assert float(cmd.speed_right) == pytest.approx(er, abs=1e-6)
    assert float(cmd.speed_left) > float(cmd.speed_right)  # turning right

    # publish-on-change: same stick -> no new message
    node.update()
    ps.tick()
    assert sub.try_recv() is None

    # release -> zero command published once
    node.set_stick(0.0, 0.0)
    node.update()
    ps.tick()
    cmd = sub.try_recv()
    assert float(cmd.speed_left) == 0.0 and float(cmd.speed_right) == 0.0


def test_shape_test_node_draws():
    from slamrs_tpu.graph.nodes.util import ShapeTestNodeConfig

    node = ShapeTestNodeConfig(grid_steps=8).instantiate(PubSub())
    sr = ShapeRenderer()
    node.draw(sr)
    calls = sr.flush()
    kinds = {c.primitive.value for c in calls}
    assert "filled" in kinds and "line" in kinds
    total_vertices = sum(len(c.vertices) for c in calls)
    assert total_vertices > 8 * 8 * 6  # rect field + circles + arrows


def test_gaussian_test_node_publishes_and_draws():
    from slamrs_tpu.graph.nodes.util import GaussianTestNodeConfig

    ps = PubSub()
    node = GaussianTestNodeConfig(topic="g").instantiate(ps)
    sub = ps.subscribe("g", Gaussian2D)
    node.gaussian.mean = np.array([0.5, -0.25], np.float32)
    node.gaussian.covariance = np.array([[0.04, 0.0], [0.0, 0.01]],
                                        np.float32)
    node.update()
    ps.tick()
    msg = sub.try_recv()
    assert msg is not None and float(msg.mean[0]) == 0.5

    sr = ShapeRenderer()
    node.draw(sr)
    calls = sr.flush()
    assert calls and calls[0].primitive.value == "line"
    # the ellipse is centered at the mean
    vs = np.asarray(calls[0].vertices)
    assert abs(vs[:, 0].mean() - 0.5) < 0.05
    assert abs(vs[:, 1].mean() + 0.25) < 0.05


def test_ekf_correlation_heatmap():
    import jax
    import jax.numpy as jnp

    from slamrs_tpu.core.types import LandmarkScan, OdometryReading
    from slamrs_tpu.graph.node import LandmarkOdometry
    from slamrs_tpu.graph.nodes.slam import EKFLandmarkSlamNodeConfig

    ps = PubSub()
    node = EKFLandmarkSlamNodeConfig(
        topic_observation_landmark="lm", topic_pose="pose",
        topic_map="map").instantiate(ps)

    corr = node.correlation_matrix()
    d = node.state.mean.shape[-1]
    assert corr.shape == (d, d)
    # the reference initializes the pose covariance block to ZERO
    # (ekf.rs:22-31), so its correlation rows are 0; landmark rows are 1
    diag = np.diag(corr)
    assert np.allclose(diag[3:], 1.0, atol=1e-6)
    assert np.isfinite(corr).all()
    assert np.abs(corr).max() <= 1.0 + 1e-6

    sr = ShapeRenderer()
    node.draw(sr)
    calls = sr.flush()
    total = sum(len(c.vertices) for c in calls)
    assert total == d * d * 6  # one filled rect (2 tris) per matrix cell


def test_serial_medium_pty_roundtrip():
    """SerialMedium against a pty pair (the trait-seam fake strategy the
    reference uses for its serial parsers, SURVEY §4)."""
    from slamrs_tpu.io.connection import SerialMedium

    leader, follower = os.openpty()
    try:
        m = SerialMedium(os.ttyname(follower), timeout=0.5)
        os.write(leader, b"\xfa\xa0hello")
        got = m.read(16)
        assert got.startswith(b"\xfa\xa0")
        m.write(b"pong")
        back = os.read(leader, 16)
        assert back == b"pong"
        # timeout path: empty read, no exception (connection.rs:291-293)
        m.timeout = 0.05
        assert m.read(16) == b""
        m.close()
    finally:
        os.close(leader)
        try:
            os.close(follower)
        except OSError:
            pass


def test_open_medium_resolves_serial_vs_tcp():
    from slamrs_tpu.io import connection as C

    assert C.open_medium.__doc__  # resolver exists
    # a path target resolves to SerialMedium (pty as stand-in device)
    leader, follower = os.openpty()
    try:
        m = C.open_medium(os.ttyname(follower))
        assert isinstance(m, C.SerialMedium)
        m.close()
    finally:
        os.close(leader)
        os.close(follower)


def test_app_draw_hook_renders():
    from slamrs_tpu.graph.app import App

    app = App.from_yaml("""
settings: {}
nodes:
  - !ShapeTest
    grid_steps: 4
""", with_renderer=True)
    app.frame()
    calls = app.renderer.flush()
    assert calls, "draw hook did not reach the renderer"


def test_app_renderer_does_not_accumulate_frames():
    """Review regression: draw hooks re-emit per frame; the renderer must
    hold only the LAST frame's geometry after a run."""
    from slamrs_tpu.graph.app import App

    app = App.from_yaml("""
settings: {}
nodes:
  - !ShapeTest
    grid_steps: 3
""", with_renderer=True)
    app.frame()
    one = sum(len(c.vertices) for c in app.renderer._calls)
    for _ in range(4):
        app.frame()
    final = sum(len(c.vertices) for c in app.renderer._calls)
    assert final == one, (final, one)


def test_gridmap_node_publishes_unpadded_fused_grid():
    """Review regression: the fused path's 128-padded columns must be
    sliced off before publishing (visualizers derive extent from shape)."""
    import jax.numpy as jnp
    import numpy as np

    from slamrs_tpu.core.types import Scan, OdometryReading
    from slamrs_tpu.graph.node import GridMapMessage, ScanOdometry
    from slamrs_tpu.graph.nodes.slam import GridMapSlamNodeConfig
    from slamrs_tpu.graph.pubsub import PubSub

    ps = PubSub()
    node = GridMapSlamNodeConfig(
        topic_pose="pose", topic_observation_odometry="obs",
        topic_map="map",
        config={"position": [-2.0, -2.0], "width": 4.0, "height": 4.0,
                "resolution": 0.1, "n_particles": 2,
                "integrate": "fused"}).instantiate(ps)
    sub = ps.subscribe("map", GridMapMessage)
    B = 90
    angles = jnp.arange(B, dtype=jnp.float32) * (2 * np.pi / B)
    scan = Scan(angles, jnp.full((B,), 0.8, jnp.float32),
                jnp.ones((B,)), jnp.ones((B,), bool), jnp.ones((B,), bool))
    ps.publish("obs", ScanOdometry).publish(ScanOdometry(
        scan, OdometryReading.make(0.01, 0.012)))
    ps.tick()
    node.update()
    ps.tick()
    msg = sub.try_recv()
    assert msg is not None
    assert msg.data.shape == (40, 40), msg.data.shape  # not (40, 128)


def test_controls_script_yields_to_teleop():
    """A set_command (the --teleop path) suspends the drive script for
    good: without this, update() republishes the matching script row on
    the next 30 Hz frame and every keypress is reverted within ~33 ms."""
    from slamrs_tpu.graph.nodes.util import ControlsNode, ControlsNodeConfig

    ps = PubSub()
    node = ControlsNodeConfig(
        topic_command="cmd",
        script=[[10.0, 0.05, 0.08]]).instantiate(ps)
    sub = ps.subscribe("cmd", Command)

    node.advance(1 / 30)
    node.update()  # script row published
    ps.tick()
    cmd = sub.try_recv()
    np.testing.assert_allclose(
        [float(cmd.speed_left), float(cmd.speed_right)], [0.05, 0.08],
        rtol=1e-6)

    node.set_command(0.1, -0.1)  # teleop keypress
    ps.tick()
    cmd = sub.try_recv()
    np.testing.assert_allclose(
        [float(cmd.speed_left), float(cmd.speed_right)], [0.1, -0.1],
        rtol=1e-6)

    node.advance(1 / 30)
    node.update()  # the script must NOT take the command back
    ps.tick()
    assert sub.try_recv() is None
