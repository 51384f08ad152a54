"""bayesflow_nddms_tpu — TPU-native amortized inference for DDMs with
identifiable within-trial noise.

Ground-up JAX/XLA/Pallas rebuild of the capabilities of
mdnunez/bayesflow_nddms (Nunez, Schubert, Frischkorn & Oberauer 2024):
amortized neural posterior estimation (DeepSet summary + conditional
coupling flow), an exact-likelihood WFPT NUTS/HMC backend, and the full
diagnostics/recovery/misspecification tooling — all fused on-device.
"""

__version__ = "0.1.0"

from .models.spec import ModelSpec, generate_training_batch  # noqa: F401
from .models.zoo import get_model, list_models, register     # noqa: F401
from .nets.amortizer import AmortizedPosterior, build_amortizer  # noqa: F401
from .train.trainer import TrainConfig, Trainer              # noqa: F401
