from gslora_tpu.models import heads  # noqa: F401
from gslora_tpu.models.vit import (  # noqa: F401
    init_vit_params,
    vit_apply,
    vit_embed,
)
