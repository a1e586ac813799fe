"""PDS model family: embedding, matching, regularization, full network."""

from practicaldeepstereo_nips2018_tpu.models.network import (
    PDSConfig,
    init,
    apply,
    infer,
    validate_maximum_disparity,
)

__all__ = ["PDSConfig", "init", "apply", "infer",
           "validate_maximum_disparity"]
