"""Headless application shell: the frame loop that drives a node graph.

Parity surface: ``App`` (baseui/src/app.rs:14-215) — per frame: tick the
pub/sub distributor, advance time-based nodes, run every node's
``update``, track frame-time PerfStats.  The egui window/GL painting is
replaced by the Visualizer node's export hooks.

Time is virtual by default (deterministic headless runs: every frame
advances ``frame_dt`` seconds); pass ``realtime=True`` to pace against the
wall clock like the reference's 30 Hz threads.
"""

from __future__ import annotations

import time
from typing import Optional

from slamrs_tpu.graph.config import Config, load_config, parse_config
from slamrs_tpu.graph.pubsub import PubSub
from slamrs_tpu.utils import PerfStats


class App:
    def __init__(self, config: Config, frame_dt: float = 1.0 / 30.0,
                 realtime: bool = False, with_renderer: bool = False):
        self.pubsub = PubSub()
        self.config = config
        self.nodes = config.instantiate_nodes(self.pubsub)
        self.frame_dt = frame_dt
        self.realtime = realtime
        self.frame_stats = PerfStats()
        self.time = 0.0
        # world renderer for nodes' draw hooks (App::custom_painting /
        # WorldObj, app.rs:142-155); opt-in — headless runs skip vertex work
        self.renderer = None
        self.world_obj = None
        if with_renderer:
            from slamrs_tpu.viz.shapes import ShapeRenderer, WorldObj

            self.renderer = ShapeRenderer()
            self.world_obj = WorldObj(self.renderer)

    @staticmethod
    def from_file(path: str, **kwargs) -> "App":
        return App(load_config(path), **kwargs)

    @staticmethod
    def from_yaml(contents: str, **kwargs) -> "App":
        return App(parse_config(contents), **kwargs)

    def frame(self) -> None:
        """One app frame (App::update, app.rs:60-155)."""
        with self.frame_stats.timeit():
            self.pubsub.tick()
            for n in self.nodes:
                advance = getattr(n, "advance", None)
                if advance is not None:
                    advance(self.frame_dt)
            self.pubsub.tick()
            for n in self.nodes:
                n.update()
            self.pubsub.tick()
            if self.renderer is not None:
                # immediate-mode semantics (app.rs redraws every frame):
                # discard the previous frame's geometry so draw calls
                # never accumulate across frames; consumers flush() after
                # the last frame to rasterize it
                self.renderer.flush()
                for n in self.nodes:
                    n.draw(self.world_obj)
        self.time += self.frame_dt

    def run(self, frames: Optional[int] = None,
            duration_s: Optional[float] = None) -> None:
        if frames is None:
            frames = int(round((duration_s or 1.0) / self.frame_dt))
        for _ in range(frames):
            t0 = time.perf_counter()
            self.frame()
            if self.realtime:
                sleep = self.frame_dt - (time.perf_counter() - t0)
                if sleep > 0:
                    time.sleep(sleep)

    def apply_config(self, contents: str) -> None:
        """Live config swap: terminate every node, rebuild the graph from
        the new YAML with a fresh PubSub (the reference's config-editor
        Apply, app.rs:121-134 — all node state is discarded)."""
        for n in self.nodes:
            n.terminate()
        self.config = parse_config(contents)
        self.pubsub = PubSub()
        self.nodes = self.config.instantiate_nodes(self.pubsub)
        self.time = 0.0

    @staticmethod
    def presets() -> dict:
        """Bundled config presets (the editor's preset combo,
        baseui/src/editor.rs:29-41)."""
        from pathlib import Path

        preset_dir = Path(__file__).resolve().parents[2] / "configs"
        return {p.stem: p.read_text()
                for p in sorted(preset_dir.glob("*.yaml"))}

    def node(self, cls):
        """First node instance of the given class (test/tooling helper)."""
        for n in self.nodes:
            if isinstance(n, cls):
                return n
        return None

    def terminate(self) -> None:
        for n in self.nodes:
            n.terminate()
