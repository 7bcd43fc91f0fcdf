"""Helper-transitive stale-grading lint (VERDICT r7 #2).

The driver grades a 50-entry prefix of the suite per round. Round 7
showed that auditing registered function BODIES alone has a blind
spot: commit fc3b048 changed the shared SPARK_DOT/SQL_DOT helpers,
silently changing ``ext_hybrid_search``'s effective computation while
its body stayed byte-identical — and its only driver row predated the
change.

``tools/effhash.py`` hashes each entry's EFFECTIVE source (function
source + transitive in-package helpers/classes + module-level
constants + the oracle SQL). ``tests/effective_hashes.json`` snapshots
those hashes from the tree the driver last graded (its ``ref`` field
records the commit); this test asserts every entry whose effective
hash changed since that snapshot sits INSIDE the graded 50-prefix.

Snapshot refresh procedure (round start, after CORRECTNESS_r{N}
lands): ``python tools/effhash.py --update <graded-commit>`` run on a
checkout of that commit (copy effhash.py in if the graded tree
predates it), then commit the regenerated JSON alongside the window
rotation.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from effhash import (  # noqa: E402
    SNAPSHOT,
    _window,
    check,
    effective_hash,
    effective_pieces,
)

WINDOW = _window()


def test_window_matches_suite_export():
    """ADVICE r8 #3: the lint's prefix length must be the suite's own
    exported window, and the graded prefix must cover exactly the
    _WINDOW list the rotation comment documents."""
    from marketing_etl_analytics_spark.suite import GRADED_WINDOW, SUITE
    from marketing_etl_analytics_spark.suite import __init__ as _  # noqa: F401
    import marketing_etl_analytics_spark.suite as suite_pkg

    assert WINDOW == GRADED_WINDOW == 50
    assert list(SUITE)[:GRADED_WINDOW] == suite_pkg._WINDOW


def test_snapshot_exists_and_names_known_entries():
    snap = json.loads(SNAPSHOT.read_text())
    assert snap["ref"], "snapshot must record the graded commit"
    assert len(snap["hashes"]) >= WINDOW


def test_changed_effective_code_sits_inside_graded_window():
    violations = check()
    assert not violations, (
        "entries whose effective computation changed since the last "
        f"driver-graded tree sit OUTSIDE the 50-entry window: {violations}. "
        "Either move them into the window (suite/__init__.py _PRIORITY) "
        "or revert the helper change."
    )


def test_hash_is_helper_transitive():
    """Synthetic helper edit: overriding the source text recorded for a
    shared helper (SPARK_DOT — the exact fc3b048 blind spot) must change
    a consumer entry's hash even though the entry body is untouched."""
    from marketing_etl_analytics_spark.suite import SUITE

    entry = SUITE["ext_hybrid_search"]
    pieces = effective_pieces(entry.fn, entry.oracle)
    dot_keys = [k for k in pieces if k.endswith(".SPARK_DOT")]
    assert dot_keys, (
        "SPARK_DOT not found in ext_hybrid_search's effective closure — "
        f"transitive resolution broke; closure keys: {sorted(pieces)[:20]}"
    )
    base = effective_hash(entry.fn, entry.oracle)
    edited = effective_hash(
        entry.fn, entry.oracle,
        override_source={dot_keys[0]: "'tampered dot product'"},
    )
    assert edited != base


def test_hash_is_stable_within_process():
    from marketing_etl_analytics_spark.suite import SUITE

    entry = SUITE["q4_channel_kpis"]
    assert effective_hash(entry.fn, entry.oracle) == effective_hash(
        entry.fn, entry.oracle
    )
