from gslora_tpu.evaluation.verification import (  # noqa: F401
    calculate_accuracy,
    calculate_roc,
    calculate_val,
    evaluate_verification,
    perform_val,
)
