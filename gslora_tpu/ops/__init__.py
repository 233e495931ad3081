from gslora_tpu.ops.group_lasso import (  # noqa: F401
    group_lasso_pallas,
    group_prox_pallas,
)
