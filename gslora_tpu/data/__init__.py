from gslora_tpu.data.folders import ArrayDataset, ImageFolderDataset  # noqa: F401
from gslora_tpu.data.splits import (  # noqa: F401
    few_shot_subset,
    make_order_list,
    random_relabel,
    ratio_subset,
    split_by_class_window,
    task_windows,
)
from gslora_tpu.data.pipeline import BatchLoader, CyclingLoader  # noqa: F401
from gslora_tpu.data.synthetic import synthetic_face_dataset  # noqa: F401
