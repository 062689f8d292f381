"""Compatibility facade over the queries/ package.

The 25.6k-line registry module was split along its family seams into
``queries/`` (r13 verdict task 6: common constants/helpers, the family
modules, and ``queries/registry`` which assembles QUERIES/ORACLE_SQL).
Every name the old module defined — query builders, oracle SQL strings,
constants, private helpers — remains importable from here unchanged;
``queries.registry``'s namespace IS the old module's namespace (the
ordered fold reproduces single-file statement semantics exactly).

NOTE for tests: monkeypatching attributes on THIS module no longer
affects query behavior (functions resolve globals in their defining
family module). Patch the defining module instead — e.g. the table
readers via ``queries.common._t_impl`` / ``_events_impl``.
"""

from __future__ import annotations

from .queries import registry as _registry

globals().update(
    {
        k: v
        for k, v in vars(_registry).items()
        if not (k.startswith("__") and k.endswith("__"))
    }
)
