"""Run-configuration system.

Replaces the reference's module-level boolean flags edited in-file
(``basic_ddm_dc.py:34-36``, ``single_trial_alpha_not_scaled.py:47-51``,
``fitting_stahl_data.py:56-61``) and the model-identity-from-__file__
convention (``basic_ddm_dc.py:40-43``): a run is a serializable dataclass
(model name + TrainConfig + study sizes) that round-trips through JSON, so
experiments are reproducible artifacts instead of edited source files.
"""

from __future__ import annotations

import dataclasses
import json

from ..models import zoo
from ..train.trainer import TrainConfig


@dataclasses.dataclass(frozen=True)
class RunConfig:
    model: str = "basic_ddm_dc"
    train: TrainConfig = TrainConfig()
    num_test: int = 500          # recovery-study datasets
    n_draws: int = 1000          # posterior draws per dataset
    plot_dir: str = "recovery_plots"
    seed: int = 2023

    def __post_init__(self):
        if self.model not in zoo.list_models():
            raise ValueError(f"unknown model {self.model!r}; "
                             f"registered: {zoo.list_models()}")

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, text: str) -> "RunConfig":
        d = json.loads(text)
        train = TrainConfig(**d.pop("train", {}))
        return cls(train=train, **d)

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "RunConfig":
        with open(path) as f:
            return cls.from_json(f.read())

    @property
    def spec(self):
        return zoo.get_model(self.model)

    def default_ckpt_dir(self) -> str:
        return self.train.ckpt_dir or f"checkpoint/{self.model}"
