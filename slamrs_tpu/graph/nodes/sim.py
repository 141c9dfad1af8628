"""Simulator node: wraps the jitted simulator tick for the host graph.

Parity surface: ``SimulatorNode(Config)`` (slamrs/simulator/src/lib.rs:22-159)
— YAML fields match the reference config (topic_observation_scanner,
topic_observation_landmarks, topic_pose, topic_command, running, scene
[!Line/!Rectangle], landmarks [!Landmark], parameters).

The reference runs a 30 Hz wall-clock accumulator thread
(lib.rs:274-299); here the node advances a *virtual* fixed-timestep clock
on every app frame (deterministic, headless-friendly) — the App decides
the real-time pacing.  Each update runs the accumulated number of dt
ticks through one jitted function; outputs are published only on scan
fire.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from slamrs_tpu.core.types import Command
from slamrs_tpu.graph.node import (LandmarkOdometry, Node, NodeConfig,
                                   PoseMsg, ScanOdometry)
from slamrs_tpu.models import simulator as sim_model


@dataclasses.dataclass
class SimulatorNodeConfig(NodeConfig):
    topic_command: str
    running: bool = True
    topic_observation_scanner: Optional[str] = None
    topic_observation_landmarks: Optional[str] = None
    topic_pose: Optional[str] = None
    scene: list = dataclasses.field(default_factory=list)  # SceneObject dicts
    landmarks: list = dataclasses.field(default_factory=list)
    parameters: dict = dataclasses.field(default_factory=dict)
    draw_scene: bool = True
    draw_pose: bool = True
    seed: int = 0

    def build_scene(self) -> sim_model.Scene:
        lines, rects = [], []
        for obj in self.scene:
            tag, fields = obj if isinstance(obj, tuple) else (
                obj.get("_tag"), obj)
            if tag == "Line":
                lines.append((fields["x1"], fields["y1"], fields["x2"],
                              fields["y2"]))
            elif tag == "Rectangle":
                rects.append((fields["x"], fields["y"], fields["width"],
                              fields["height"]))
            else:
                raise ValueError(f"unknown scene object {tag!r}")
        lms = []
        for lm in self.landmarks:
            tag, fields = lm if isinstance(lm, tuple) else (
                lm.get("_tag"), lm)
            lms.append((fields["x"], fields["y"]))
        return sim_model.Scene.build(lines=lines, rects=rects, landmarks=lms)

    def instantiate(self, pubsub) -> "SimulatorNode":
        return SimulatorNode(self, pubsub)


class SimulatorNode(Node):
    def __init__(self, config: SimulatorNodeConfig, pubsub):
        self.config = config
        self.scene = config.build_scene()
        self.params = sim_model.SimParams.make(**config.parameters)
        self.state = sim_model.SimState.init()
        self.key = jax.random.key(config.seed)
        self.running = config.running
        self.accumulator = 0.0
        self.dt = sim_model.DEFAULT_DT

        self.sub_cmd = pubsub.subscribe(config.topic_command, Command)
        self.pub_scan = (pubsub.publish(config.topic_observation_scanner,
                                        ScanOdometry)
                         if config.topic_observation_scanner else None)
        self.pub_landmarks = (pubsub.publish(config.topic_observation_landmarks,
                                             LandmarkOdometry)
                              if config.topic_observation_landmarks else None)
        self.pub_pose = (pubsub.publish(config.topic_pose, PoseMsg)
                         if config.topic_pose else None)
        self.cmd = Command.make()
        # params enter as a jit ARGUMENT (not a closure constant): the
        # SimParams leaves are traced scalars, so set_parameters() takes
        # effect on the very next tick without recompiling — the
        # reference's live sliders (simulator/src/lib.rs:133-140)
        self._tick = jax.jit(
            lambda state, cmd, key, params: sim_model.tick(
                state, cmd, key, params, self.scene, self.dt))

    def advance(self, wall_dt: float) -> None:
        """Fixed-timestep accumulator (lib.rs:274-299)."""
        if not self.running:
            return
        self.accumulator += wall_dt
        while self.accumulator >= self.dt:
            self.accumulator -= self.dt
            self._one_tick()

    def _one_tick(self) -> None:
        cmd = self.sub_cmd.latest()
        if cmd is not None:
            self.cmd = cmd
        self.key, sub = jax.random.split(self.key)
        self.state, out = self._tick(self.state, self.cmd, sub, self.params)
        if bool(out.fired):
            if self.pub_pose:
                self.pub_pose.publish(PoseMsg(np.asarray(out.pose)))
            if self.pub_scan:
                self.pub_scan.publish(ScanOdometry(out.scan, out.odometry))
            if self.pub_landmarks:
                self.pub_landmarks.publish(
                    LandmarkOdometry(out.landmarks, out.odometry))

    def update(self) -> None:
        # App calls advance() with frame time; update() is a no-op hook kept
        # for Node parity (the reference ticks from draw(), lib.rs:123).
        pass

    def set_parameters(self, **kwargs) -> None:
        """Mutate simulator parameters on the RUNNING node — the
        reference's live UI sliders (simulator/src/lib.rs:133-140:
        update_period, scanner range, uncertainties + the running
        checkbox).  Params are traced jit arguments, so the change takes
        effect on the next tick with NO recompile (asserted by
        tests/test_live_params.py via the jit cache size)."""
        if "running" in kwargs:
            self.running = bool(kwargs.pop("running"))
        unknown = set(kwargs) - set(sim_model.SimParams._fields)
        if unknown:
            raise ValueError(f"unknown simulator parameters: {sorted(unknown)}")
        self.params = self.params._replace(
            **{k: jnp.asarray(v, jnp.float32) for k, v in kwargs.items()})

    def draw(self, viz=None) -> None:
        """Scene segments + ground-truth pose arrow (lib.rs:142-154):
        the world that produced the map, gated by the same
        draw_scene/draw_pose config flags as the reference."""
        if viz is None:
            return
        from slamrs_tpu.viz.shapes import Color, PrimitiveType

        if self.config.draw_scene:
            segs = np.asarray(self.scene.segments, np.float32)
            mask = np.asarray(self.scene.segment_mask, bool)
            viz.sr.begin(PrimitiveType.LINE)
            viz.sr.lines_batch(segs[mask].reshape(-1, 2, 2),
                               np.float32([0, 0, 0, 1]))
            viz.sr.end()
        if self.config.draw_pose:
            x, y, th = (float(p) for p in self.get_pose())
            viz.sr.begin(PrimitiveType.FILLED)
            viz.sr.arrow(x, y, th, 0.1, Color.BLUE)
            viz.sr.end()

    def get_pose(self) -> np.ndarray:
        return np.asarray(self.state.pose)

    def terminate(self) -> None:
        self.running = False
