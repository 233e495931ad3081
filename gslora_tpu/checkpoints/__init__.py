from gslora_tpu.checkpoints.io import (  # noqa: F401
    BestHCheckpointer,
    load_pytree,
    save_pytree,
)
