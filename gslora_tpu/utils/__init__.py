from gslora_tpu.utils.inits import (  # noqa: F401
    kaiming_uniform,
    lecun_linear_bias,
    xavier_normal,
    xavier_uniform,
)
from gslora_tpu.utils.meters import AverageMeter  # noqa: F401
