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
