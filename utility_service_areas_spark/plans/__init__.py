"""Query-plan modules (one per family; registered via plans.registry).

Shared oracle constants live here so every mirrored DuckDB CTE and its
Spark twin derive bounds from ONE place (r13 ADVICE fix: the RAKE
oracle used generate_series(1, 4096) while the LRS oracle used
range(1, 4096) — end-exclusive, an off-by-one between idioms — and
only LRS documented the cap).
"""

# Positional-unnest cap for oracles that enumerate token/char
# positions via generate_series(1, ORACLE_POS_CAP) — DuckDB has no
# posexplode, so position joins enumerate a bounded series. INCLUSIVE
# bound; always pair with `WHERE i <= len(...)`. Spark sides that
# posexplode must slice their array to the same cap (F.slice(arr, 1,
# ORACLE_POS_CAP)) so documents longer than the cap truncate
# IDENTICALLY on both engines instead of diverging silently. Far above
# the substrate's ~120-token / 577-char max documents; a production
# corpus with longer docs raises this constant in one place.
ORACLE_POS_CAP = 4096
