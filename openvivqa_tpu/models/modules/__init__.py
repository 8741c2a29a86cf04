from . import attentions  # noqa: F401
from . import decoders  # noqa: F401
from . import encoders  # noqa: F401
from . import text_embeddings  # noqa: F401
from . import vision_embeddings  # noqa: F401
from . import pretrained_embeddings  # noqa: F401
from . import bert  # noqa: F401
from . import scp_tss  # noqa: F401
from .attentions import MultiHeadAttention  # noqa: F401
from .ffn import PositionWiseFeedForward  # noqa: F401
from .masks import (  # noqa: F401
    MASK_VALUE,
    box_relational_embedding,
    causal_bias,
    combine_biases,
    padding_bias,
    sinusoid_encoding_table,
)
from .position import SinusoidPositionalEmbedding  # noqa: F401
