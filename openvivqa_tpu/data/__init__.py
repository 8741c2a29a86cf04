from . import vocab  # noqa: F401  (registers Vocab family)
from . import multimodal_vocab  # noqa: F401
from . import ocr_vocab  # noqa: F401
from . import ocr_datasets  # noqa: F401
from . import multilingual  # noqa: F401
from . import image_datasets  # noqa: F401
from . import datasets  # noqa: F401  (registers dataset family)
from . import word_embedding  # noqa: F401  (registers word embeddings)
from .loader import DataLoader  # noqa: F401
from .text_utils import (  # noqa: F401
    get_tokenizer,
    is_japanese_sentence,
    preprocess_sentence,
)
