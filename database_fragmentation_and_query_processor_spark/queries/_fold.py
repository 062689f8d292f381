"""Ordered namespace fold for the queries/ package.

entry_queries.py was one 25.6k-line module whose statements executed
top-to-bottom in a single namespace (r13 verdict task 6 split it along
its family seams). Each split module starts by folding every module
that preceded it in the ORIGINAL statement order into its own globals,
which reproduces exactly the name-visibility the statements had in the
single file — no semantic change, no import-order surprises.
"""

from __future__ import annotations

import importlib

#: the original statement order of the non-registry modules
ORDER = ['common', 'families', 'batteries', 'curation', 'docops', 'sequences', 'stats', 'selection', 'tokenlearn', 'corpusops']


def fold_upto(g: dict, modname: str | None) -> None:
    """Fold every module strictly BEFORE ``modname`` (or all of ORDER
    when ``modname`` is None, for the registry) into namespace ``g``."""
    upto = ORDER.index(modname) if modname is not None else len(ORDER)
    for m in ORDER[:upto]:
        mod = importlib.import_module(f".{m}", __package__)
        g.update(
            {
                k: v
                for k, v in vars(mod).items()
                if not (k.startswith("__") and k.endswith("__"))
            }
        )
