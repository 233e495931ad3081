from gslora_tpu.lora.core import (  # noqa: F401
    group_lasso,
    init_lora,
    lora_group_norms,
    merge_lora,
    reinit_lora,
)
