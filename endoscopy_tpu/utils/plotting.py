"""Optional-matplotlib guard shared by plotting call sites.

Standalone on purpose: importing this module must not pull jax (the EDA CLI
draws charts on data-prep boxes that may have pandas/matplotlib but no
accelerator stack).
"""

from __future__ import annotations


def _plt():
    """Agg-backend pyplot, or None when matplotlib is unavailable
    (headless pods degrade to returning computed arrays)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except ImportError:  # pragma: no cover
        return None
