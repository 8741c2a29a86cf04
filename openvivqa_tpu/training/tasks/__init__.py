from .base_task import BaseTask  # noqa: F401
from .classification_task import ClassificationTask  # noqa: F401
from .open_ended_task import OpenEndedTask, TrainingSAAATask  # noqa: F401
from .ocr_tasks import (  # noqa: F401
    MmfClassificationTask,
    OcrOpenEndedTask,
    TrainingM4C,
    TrainingMMF,
)
from .vlsp_evjvqa_task import VlspEvjVqaTask  # noqa: F401
