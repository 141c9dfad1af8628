"""Headless visualizer node: collects topic values, exports PNG/NPZ.

Parity surface: baseui/src/node/{frame_viz,visualize}.rs — the same YAML
``topics:`` list with ``!GridMap``, ``!Observation``, ``!Pose``,
``!PointMap``, ``!LandmarkObservation``, ``!LandmarkMap`` entries.  The
egui/OpenGL immediate-mode renderer is host tooling outside the TPU
framework core (SURVEY §7); this node keeps the latest value per topic and
can render a matplotlib figure (grid map as grayscale image, scans/point
maps as scatters, poses as arrows, landmark covariance ellipses) or dump
raw arrays to NPZ for external tooling.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

from slamrs_tpu.graph.node import (GridMapMessage, LandmarkMapMessage,
                                   Node, NodeConfig, PointMapMessage, PoseMsg)


@dataclasses.dataclass
class VisualizerNodeConfig(NodeConfig):
    topics: list = dataclasses.field(default_factory=list)

    def instantiate(self, pubsub) -> "VisualizerNode":
        return VisualizerNode(self, pubsub)


class _TopicViz:
    def __init__(self, kind: str, fields: dict, pubsub):
        self.kind = kind
        self.config = fields.get("config") or {}
        self.topic = fields["topic"]
        self.sub = pubsub.subscribe(self.topic)
        self.pose_sub = (pubsub.subscribe(fields["topic_pose"])
                         if fields.get("topic_pose") else None)
        self.latest: Optional[Any] = None
        self.latest_pose: Optional[Any] = None

    def update(self):
        v = self.sub.latest()
        if v is not None:
            self.latest = v
        if self.pose_sub is not None:
            p = self.pose_sub.latest()
            if p is not None:
                self.latest_pose = p


class VisualizerNode(Node):
    def __init__(self, config: VisualizerNodeConfig, pubsub):
        self.viz: list[_TopicViz] = []
        for t in config.topics:
            tag, fields = t if isinstance(t, tuple) else (t.get("_tag"), t)
            self.viz.append(_TopicViz(tag, fields, pubsub))

    def update(self) -> None:
        for v in self.viz:
            v.update()

    def latest(self, topic: str):
        for v in self.viz:
            if v.topic == topic:
                return v.latest
        return None

    def save_npz(self, path: str) -> None:
        arrays = {}
        for v in self.viz:
            key = v.topic.replace("/", "_")
            m = v.latest
            if isinstance(m, GridMapMessage):
                arrays[f"{key}_grid"] = m.data
                arrays[f"{key}_position"] = m.position
                arrays[f"{key}_resolution"] = np.float32(m.resolution)
            elif isinstance(m, PointMapMessage):
                arrays[f"{key}_points"] = m.points
            elif isinstance(m, PoseMsg):
                arrays[f"{key}_pose"] = m.pose
            elif isinstance(m, LandmarkMapMessage):
                arrays[f"{key}_means"] = m.means
                arrays[f"{key}_covs"] = m.covariances
        np.savez(path, **arrays)

    def render_png(self, path: str) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 7))
        ax.set_aspect("equal")
        for v in self.viz:
            m = v.latest
            if isinstance(m, GridMapMessage):
                h, w = m.data.shape
                extent = [m.position[0], m.position[0] + w * m.resolution,
                          m.position[1], m.position[1] + h * m.resolution]
                ax.imshow(1.0 - m.data, cmap="gray", origin="lower",
                          extent=extent, vmin=0, vmax=1)
            elif isinstance(m, PointMapMessage) and len(m.points):
                ax.scatter(m.points[:, 0], m.points[:, 1], s=1, c="g")
            elif isinstance(m, PoseMsg):
                x, y, th = m.pose
                ax.arrow(x, y, 0.1 * np.cos(th), 0.1 * np.sin(th),
                         head_width=0.03, color="c")
            elif isinstance(m, LandmarkMapMessage):
                for i in range(len(m.means)):
                    if not m.seen[i]:
                        continue
                    ax.plot(*m.means[i], "r+")
                    _cov_ellipse(ax, m.means[i], m.covariances[i])
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)


def _cov_ellipse(ax, mean, cov, n_std=2.0):
    """Covariance ellipse via eigendecomposition (shaperenderer.rs:243-247)."""
    from matplotlib.patches import Ellipse

    vals, vecs = np.linalg.eigh(cov)
    vals = np.maximum(vals, 0.0)
    angle = np.degrees(np.arctan2(vecs[1, 1], vecs[0, 1]))
    ax.add_patch(Ellipse(mean, 2 * n_std * np.sqrt(vals[1]),
                         2 * n_std * np.sqrt(vals[0]), angle=angle,
                         fill=False, color="r", lw=0.8))
