from gslora_tpu.losses.classification import (  # noqa: F401
    bounded_forget_loss,
    cross_entropy,
    top1_accuracy,
)
from gslora_tpu.losses.prototype import prototype_loss  # noqa: F401
from gslora_tpu.lora.core import group_lasso  # noqa: F401
from gslora_tpu.losses.regularization import quadratic_penalty  # noqa: F401
from gslora_tpu.losses.distillation import (  # noqa: F401
    attention_transfer_loss,
    kd_kl_loss,
)
