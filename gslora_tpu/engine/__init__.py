from gslora_tpu.engine.schedule import timm_cosine_lr  # noqa: F401
from gslora_tpu.engine.state import ForgetState, make_optimizer  # noqa: F401
from gslora_tpu.engine.forget import make_forget_step  # noqa: F401
from gslora_tpu.engine.evaluate import h_mean, make_eval_step  # noqa: F401
from gslora_tpu.engine.ema import ema_init, ema_update, merged_params  # noqa: F401
