from . import tasks  # noqa: F401  (registers task classes)
from .train_state import TrainState, nll_loss  # noqa: F401
