from . import modules  # noqa: F401  (registers attention/encoder/decoder/embeddings)
from . import saaa  # noqa: F401
from . import mcan  # noqa: F401
from . import iterative_mcan  # noqa: F401
