from . import queries  # the submodule; access queries.QUERIES / queries.ORACLES

__all__ = ["queries"]
