"""Shape renderer / camera / tracing / CLI tests."""

import numpy as np
import pytest

from slamrs_tpu.viz.shapes import (Camera, Color, PrimitiveType,
                                   ShapeRenderer, render_draw_calls)


def test_shape_batching():
    sr = ShapeRenderer()
    sr.begin(PrimitiveType.LINE)
    sr.line(0, 0, 1, 1, Color.RED)
    sr.rect(0, 0, 2, 2, Color.BLACK)
    sr.end()
    sr.begin(PrimitiveType.POINT)
    sr.point(0.5, 0.5, Color.GREEN)
    sr.end()
    calls = sr.flush()
    assert len(calls) == 2
    assert calls[0].primitive == PrimitiveType.LINE
    assert len(calls[0].vertices) == 2 + 8  # line + 4 rect edges
    assert len(calls[1].vertices) == 1
    assert sr.flush() == []


def test_begin_end_discipline():
    sr = ShapeRenderer()
    sr.begin(PrimitiveType.LINE)
    with pytest.raises(RuntimeError):
        sr.begin(PrimitiveType.POINT)
    sr.end()
    with pytest.raises(RuntimeError):
        sr.end()


def test_gaussian_ellipse_vertices():
    sr = ShapeRenderer()
    sr.begin(PrimitiveType.LINE)
    sr.gaussian2d([1.0, 2.0], [[0.04, 0.0], [0.0, 0.01]], Color.RED,
                  n_std=1.0)
    sr.end()
    v = sr.flush()[0].vertices
    # ellipse vertices stay within the 1-sigma bounding box around the mean
    assert np.abs(v[:, 0] - 1.0).max() == pytest.approx(0.2, abs=0.01)
    assert np.abs(v[:, 1] - 2.0).max() == pytest.approx(0.1, abs=0.01)


def test_camera_unproject_roundtrip():
    cam = Camera(800, 600)
    cam.center[:] = (2.0, -1.0)
    cam.zoom_by(2.0)
    # center pixel maps to the camera center
    np.testing.assert_allclose(cam.unproject(400, 300), [2.0, -1.0],
                               atol=1e-9)
    # viewport width is 10/zoom world units
    left = cam.unproject(0, 300)
    right = cam.unproject(800, 300)
    assert right[0] - left[0] == pytest.approx(5.0)


def test_camera_pan():
    cam = Camera(800, 600)
    cam.pan(80, 0)  # 10% of the screen = 1 world unit at zoom 1
    assert cam.center[0] == pytest.approx(-1.0)


def test_render_png(tmp_path):
    sr = ShapeRenderer()
    sr.begin(PrimitiveType.LINE)
    sr.rect(-1, -1, 2, 2, Color.BLACK)
    sr.end()
    out = tmp_path / "shapes.png"
    render_draw_calls(sr.flush(), str(out), Camera())
    assert out.exists() and out.stat().st_size > 0


def _scan(angles, distances, valid):
    import jax.numpy as jnp

    from slamrs_tpu.core.types import Scan
    n = len(angles)
    return Scan(angles=jnp.asarray(angles, jnp.float32),
                distances=jnp.asarray(distances, jnp.float32),
                strengths=jnp.ones((n,), jnp.float32),
                valid=jnp.asarray(valid, bool),
                present=jnp.ones((n,), bool))


def test_observation_viz_rays_and_invalid_red():
    """visualize.rs:112-165: rays from the (constant-secondary) pose,
    valid black / invalid red, plus filled endpoint markers."""
    from slamrs_tpu.graph.nodes.viz import _TopicViz
    from slamrs_tpu.graph.pubsub import PubSub
    from slamrs_tpu.viz.shapes import ShapeRenderer

    ps = PubSub()
    tv = _TopicViz("Observation", {
        "topic": "obs", "pose": [1.0, 2.0, 0.0],
        "config": {"point_color": [0.0, 1.0, 0.0]}}, ps)
    pub = ps.publish("obs")
    pub.publish(_scan([0.0, np.pi / 2], [1.0, 0.5], [True, False]))
    ps.tick()
    tv.update()
    sr = ShapeRenderer()
    tv.emit(sr)
    calls = sr.flush()
    assert [c.primitive for c in calls] == [PrimitiveType.LINE,
                                            PrimitiveType.FILLED]
    lines = calls[0]
    # 2 rays from the constant pose (1, 2)
    np.testing.assert_allclose(lines.vertices[0], [1.0, 2.0])
    np.testing.assert_allclose(lines.vertices[1], [2.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(lines.colors[0], [0, 0, 0, 1])  # valid
    np.testing.assert_allclose(lines.colors[2], [1, 0, 0, 1])  # invalid red
    # endpoint markers: 2 filled rects = 12 verts, configured green
    assert len(calls[1].vertices) == 12
    np.testing.assert_allclose(calls[1].colors[0], [0, 1, 0, 1])


def test_gridmap_viz_cell_field_and_gridlines():
    """visualize.rs:243-283: one grayscale filled rect per cell; the
    gridlines config draws the lattice."""
    from slamrs_tpu.graph.node import GridMapMessage
    from slamrs_tpu.graph.nodes.viz import _TopicViz
    from slamrs_tpu.graph.pubsub import PubSub
    from slamrs_tpu.viz.shapes import ShapeRenderer

    ps = PubSub()
    tv = _TopicViz("GridMap", {"topic": "map",
                               "config": {"gridlines": True}}, ps)
    pub = ps.publish("map")
    data = np.array([[0.0, 1.0], [0.5, 0.25]], np.float32)
    pub.publish(GridMapMessage(position=np.float32([-1, -1]),
                               resolution=0.5, data=data))
    ps.tick()
    tv.update()
    sr = ShapeRenderer()
    tv.emit(sr)
    calls = sr.flush()
    assert calls[0].primitive == PrimitiveType.FILLED
    assert len(calls[0].vertices) == 4 * 6  # 4 cells x 2 triangles
    # cell (0, 1) has p=1.0 -> black; first vertex of its rect at (-0.5,-1)
    np.testing.assert_allclose(calls[0].colors[6], [0, 0, 0, 1])
    np.testing.assert_allclose(calls[0].vertices[6], [-0.5, -1.0])
    assert calls[1].primitive == PrimitiveType.LINE
    assert len(calls[1].vertices) == 2 * 4  # 2 vertical + 2 horizontal


def test_visualizer_rejects_unknown_config_fields():
    from slamrs_tpu.graph.nodes.viz import _TopicViz
    from slamrs_tpu.graph.pubsub import PubSub

    with pytest.raises(ValueError, match="unknown config"):
        _TopicViz("Pose", {"topic": "p", "config": {"colour": [1, 0, 0]}},
                  PubSub())


def test_run_png_composes_scene_scan_pose_map(tmp_path):
    """VERDICT r2 #6 done-check: a grid_slam run renders scene + scan +
    pose + map into one PNG via the draw-hook composition."""
    from slamrs_tpu.graph.app import App
    from slamrs_tpu.viz.shapes import render_draw_calls

    app = App.from_file("configs/grid_slam.yaml", with_renderer=True)
    app.run(duration_s=1.2)  # one scan at the preset's 1.0 s period
    calls = app.renderer.flush()
    app.terminate()
    prims = [c.primitive for c in calls]
    assert PrimitiveType.LINE in prims  # scene segments + scan rays
    assert PrimitiveType.FILLED in prims  # pose arrows + grid cells
    # grid cell field present: one call has >= 200*200 cells * 6 verts
    assert max(len(c.vertices) for c in calls) >= 200 * 200 * 6
    out = tmp_path / "frame.png"
    render_draw_calls(calls, str(out))
    assert out.exists() and out.stat().st_size > 10_000


def test_framebuffer_renderer():
    """Software GL-pipeline counterpart (graphics/src/{gl,shader}.rs):
    world->pixel transform + point/line/triangle rasterization."""
    from slamrs_tpu.viz.framebuffer import render, save_png
    from slamrs_tpu.viz.shapes import Camera, ShapeRenderer

    sr = ShapeRenderer()
    sr.begin(PrimitiveType.FILLED)
    sr.rect(-2.0, -2.0, 4.0, 4.0, Color.RED)  # 2 triangles
    sr.end()
    sr.begin(PrimitiveType.LINE)
    sr.line(-4.0, 0.0, 4.0, 0.0, Color.BLUE)
    sr.end()
    sr.begin(PrimitiveType.POINT)
    sr.point(0.0, 2.4, Color.BLACK)
    sr.end()
    cam = Camera(100, 100)  # 10-unit viewport -> 10 px per world unit
    fb = render(sr.flush(), cam, width=100, height=100)
    assert fb.shape == (100, 100, 4)
    # inside the red rect (off the line row)
    np.testing.assert_array_equal(fb[45, 50, :3], [255, 0, 0])
    # the blue line drew after the rect: overdraws along y=0 (row 50)
    np.testing.assert_array_equal(fb[50, 15, :3], [0, 0, 255])
    np.testing.assert_array_equal(fb[50, 50, :3], [0, 0, 255])
    # corners: background white
    np.testing.assert_array_equal(fb[2, 2, :3], [255, 255, 255])
    # the point at world (0, 2.4) -> pixel (50, 26)
    np.testing.assert_array_equal(fb[26, 50, :3], [0, 0, 0])
    # rect edges: world x=-2 -> px 30; inside red at 31, white at 28
    np.testing.assert_array_equal(fb[40, 31, :3], [255, 0, 0])
    np.testing.assert_array_equal(fb[40, 28, :3], [255, 255, 255])


def test_framebuffer_png_roundtrip(tmp_path):
    from slamrs_tpu.viz.framebuffer import render, save_png
    from slamrs_tpu.viz.shapes import Camera, ShapeRenderer

    sr = ShapeRenderer()
    sr.begin(PrimitiveType.FILLED)
    sr.circle(0, 0, 1.0, Color.GREEN)
    sr.end()
    fb = render(sr.flush(), Camera(64, 64), width=64, height=64)
    out = tmp_path / "fb.png"
    save_png(fb, str(out))
    assert out.exists() and out.stat().st_size > 100


def test_trace_spans():
    from slamrs_tpu.utils import trace

    trace.reset()
    with trace.span("unit/test"):
        pass

    @trace.instrument("unit/decorated")
    def f():
        return 41 + 1

    assert f() == 42
    st = trace.all_stats()
    assert st["unit/test"].sample_count == 1
    assert st["unit/decorated"].sample_count == 1
    assert "unit/test" in trace.report()


def test_cli_replay(capsys):
    import json
    from pathlib import Path

    data = Path("/root/reference/slamrs/baseui/data/out2.bin")
    if not data.exists():
        pytest.skip("reference recordings not mounted")
    from slamrs_tpu.__main__ import main
    main(["replay", str(data)])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["frames"] == 98


def test_app_apply_config():
    from slamrs_tpu.graph.app import App
    from slamrs_tpu.graph.nodes.util import ControlsNode

    app = App.from_yaml("nodes:\n- !MousePosition\n")
    assert app.node(ControlsNode) is None
    app.apply_config("nodes:\n- !Controls {topic_command: c}\n")
    assert app.node(ControlsNode) is not None
    presets = App.presets()
    assert "grid_slam" in presets and "icp_test" in presets
