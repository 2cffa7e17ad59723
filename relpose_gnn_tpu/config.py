"""Unified config tree with JSON round-trip.

The reference's configuration is argparse plus a block of hard-coded
hyperparameters (train.py:44-77, SURVEY.md §5); here every subsystem has a
dataclass and this module adds (de)serialization so a whole experiment is
reproducible from one JSON file:

    cfg = FrameworkConfig(experiment=..., trainer=..., model=...)
    cfg.save("run.json");  cfg = FrameworkConfig.load("run.json")
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

from relpose_gnn_tpu.data.graph_builder import GraphBuilderConfig
from relpose_gnn_tpu.models.posenet import RelPoseGNNConfig
from relpose_gnn_tpu.training.experiment import ExperimentConfig
from relpose_gnn_tpu.training.trainer import TrainerConfig


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        out = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            out[f.name] = _asdict(v)
        return out
    if isinstance(obj, (list, tuple)):
        return [_asdict(v) for v in obj]
    if hasattr(obj, "dtype") or repr(obj).startswith("<class"):
        return str(obj)
    return obj


@dataclasses.dataclass
class FrameworkConfig:
    experiment: ExperimentConfig = dataclasses.field(
        default_factory=ExperimentConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    model: RelPoseGNNConfig = dataclasses.field(
        default_factory=RelPoseGNNConfig)
    builder: GraphBuilderConfig = dataclasses.field(
        default_factory=GraphBuilderConfig)

    def to_dict(self) -> dict:
        return _asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=1)

    @classmethod
    def load(cls, path: str) -> "FrameworkConfig":
        with open(path) as f:
            d = json.load(f)

        def build(tcls, sub):
            fields = {f.name: f for f in dataclasses.fields(tcls)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    continue
                if k == "dtype":  # serialized as string; resolve lazily
                    import jax.numpy as jnp
                    v = {"<class 'jax.numpy.bfloat16'>": jnp.bfloat16,
                         "bfloat16": jnp.bfloat16,
                         "None": None}.get(str(v), None)
                elif isinstance(fields[k].default, tuple) and \
                        isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return tcls(**kwargs)

        return cls(experiment=build(ExperimentConfig, d["experiment"]),
                   trainer=build(TrainerConfig, d["trainer"]),
                   model=build(RelPoseGNNConfig, d["model"]),
                   builder=build(GraphBuilderConfig, d["builder"]))
