"""Declarative YAML node-graph configuration.

Parity surface: ``baseui/src/config.rs`` — ``Config { settings, nodes }``
with externally-tagged node variants (``!Simulator``, ``!GridMapSlam``,
``!IcpPointMapper``, ``!EKFLandmarkSlam``, ``!Splitter``, ``!Visualizer``,
``!Controls``, ``!Gamepad``, ``!MousePosition``, ``!ShapeTest``,
``!GaussianTest``, ``!FileLoader``, ``!RobotConnection`` — the full
NodeEnum at config.rs:32-49), same field vocabulary as the reference YAML
presets (slamrs/config/*.yaml, reproduced under ``configs/``).

Unknown tags raise (the reference derives ``deny_unknown_fields``).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import yaml

from slamrs_tpu.graph.node import Node, NodeConfig
from slamrs_tpu.graph import nodes as _nodes

# tag -> NodeConfig class (NodeEnum, config.rs:32-49)
NODE_REGISTRY: dict[str, type] = {
    "Simulator": _nodes.SimulatorNodeConfig,
    "Controls": _nodes.ControlsNodeConfig,
    "Gamepad": _nodes.GamepadNodeConfig,
    "MousePosition": _nodes.MousePositionNodeConfig,
    "ShapeTest": _nodes.ShapeTestNodeConfig,
    "FileLoader": _nodes.FileLoaderNodeConfig,
    "RobotConnection": _nodes.RobotConnectionNodeConfig,
    "IcpPointMapper": _nodes.IcpPointMapperNodeConfig,
    "Visualizer": _nodes.VisualizerNodeConfig,
    "GridMapSlam": _nodes.GridMapSlamNodeConfig,
    "GaussianTest": _nodes.GaussianTestNodeConfig,
    "Splitter": _nodes.SplitterNodeConfig,
    "EKFLandmarkSlam": _nodes.EKFLandmarkSlamNodeConfig,
}


class _TaggedLoader(yaml.SafeLoader):
    pass


def _tag_constructor(loader, tag_suffix, node):
    if isinstance(node, yaml.MappingNode):
        value = loader.construct_mapping(node, deep=True)
    elif isinstance(node, yaml.SequenceNode):
        value = loader.construct_sequence(node, deep=True)
    else:
        scalar = loader.construct_scalar(node)
        value = {} if scalar in (None, "") else scalar
    return (tag_suffix, value)


_TaggedLoader.add_multi_constructor("!", _tag_constructor)


@dataclasses.dataclass
class Config:
    """Parity: Config (config.rs:19-25)."""

    settings: dict = dataclasses.field(default_factory=dict)
    nodes: list = dataclasses.field(default_factory=list)  # [(tag, NodeConfig)]

    def instantiate_nodes(self, pubsub) -> list[Node]:
        """Parity: Config::instantiate_nodes (config.rs:86-91)."""
        return [cfg.instantiate(pubsub) for _, cfg in self.nodes]


def _build_node_config(tag: str, fields: Any) -> NodeConfig:
    cls = NODE_REGISTRY.get(tag)
    if cls is None:
        raise ValueError(f"unknown node type !{tag}")
    if fields is None or fields == {}:
        fields = {}
    if not isinstance(fields, dict):
        raise ValueError(f"!{tag} expects a mapping, got {type(fields)}")
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(fields) - names
    if unknown:  # deny_unknown_fields (config.rs:20)
        raise ValueError(f"!{tag}: unknown fields {sorted(unknown)}")
    return cls(**fields)


def parse_config(contents: str) -> Config:
    """Parity: Config::from_contents (config.rs:82-84)."""
    raw = yaml.load(contents, Loader=_TaggedLoader)
    if raw is None:
        return Config()
    nodes = []
    for item in raw.get("nodes", []) or []:
        if not isinstance(item, tuple):
            raise ValueError(f"node entries must be !Tagged, got {item!r}")
        tag, fields = item
        nodes.append((tag, _build_node_config(tag, fields)))
    return Config(settings=raw.get("settings") or {}, nodes=nodes)


def load_config(path: str | Path) -> Config:
    """Parity: Config::from_file (config.rs:75-80)."""
    return parse_config(Path(path).read_text())
