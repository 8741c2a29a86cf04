from .instance import Instance, Batch, collate  # noqa: F401
