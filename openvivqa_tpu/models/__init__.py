from . import modules  # noqa: F401  (registers attention/encoder/decoder/embeddings)
