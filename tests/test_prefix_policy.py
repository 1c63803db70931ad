"""The graded-prefix rotation policy, asserted against both synthetic
history and the real on-disk CORRECTNESS_r*.json artifacts.

Round-9 verdict ask #3: the prefix order is generated from driver history
(fast-lane reds -> refresh-ceiling core -> never-graded with e2e gates
first -> stalest greens), replacing the hand-curated _TIER1 list.  These
tests pin the policy so a regression in the generator is caught before
the driver grades a wrong prefix.
"""

from __future__ import annotations

import json

import __spark_entry__ as E


def _order(names, latest, current_round):
    reg = {n: i for i, n in enumerate(names)}
    return sorted(
        names, key=lambda n: E._policy_key(n, reg[n], current_round, latest)
    )


def test_fast_lane_red_first():
    names = ["a", "b", "c_red", "d"]
    latest = {"a": (9, True), "c_red": (3, False), "d": (8, True)}
    assert _order(names, latest, 10) == ["c_red", "b", "d", "a"]
    # red beats never-graded ("b") and every green; greens stalest-first.


def test_never_graded_e2e_gates_hoisted():
    names = ["x", "y_e2e", "z", "w_e2e"]
    assert _order(names, {}, 10) == ["y_e2e", "w_e2e", "x", "z"]
    # gates in registration order among themselves, then the rest.


def test_refresh_ceiling_beats_never_graded():
    core = next(iter(E._REFRESH_CORE))
    names = ["fresh", core, "never"]
    latest = {"fresh": (9, True), core: (10 - E._REFRESH_MAX_AGE, True)}
    assert _order(names, latest, 10) == [core, "never", "fresh"]
    # one round younger and the core member sorts with the plain greens:
    latest[core] = (10 - E._REFRESH_MAX_AGE + 1, True)
    assert _order(names, latest, 10) == ["never", core, "fresh"]


def test_greens_stalest_first_registration_tiebreak():
    names = ["a", "b", "c"]
    latest = {"a": (9, True), "b": (5, True), "c": (5, True)}
    assert _order(names, latest, 10) == ["b", "c", "a"]


def test_row_is_green_matches_driver_row_shapes():
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    assert E._row_is_green(ok)
    # the three historical red shapes: error row, hash mismatch, rows-only
    # row that never ran
    assert not E._row_is_green({"err": "Traceback ..."})
    assert not E._row_is_green(dict(ok, hash_match=False))
    assert not E._row_is_green({"err": "no_oracle", "spark_rows": None})
    # rows-only row that DID run counts as graded-green (the weaker check
    # is the oracle's absence, not a failure)
    assert E._row_is_green({"err": "no_oracle", "spark_rows": 8})
    # degenerate rows with NO affirmative signal (timeout recorded as {},
    # or err=None with every match field absent) are red: they must
    # re-queue via the fast lane, not sort back as the freshest green
    assert not E._row_is_green({})
    assert not E._row_is_green({"err": None})
    assert not E._row_is_green({"err": None, "rows_match": None})
    # a partial row with one affirmative signal still counts as green
    assert E._row_is_green({"err": None, "spark_rows": 3})


def test_on_disk_history_round_and_coverage():
    current_round, latest = E.grading_history()
    assert current_round >= 10
    # every CORRECTNESS row name maps into the registry (no orphans)
    names = set(E._collect("QUERIES"))
    assert set(latest) <= names


def test_real_prefix_satisfies_policy():
    """The order served to the driver obeys the policy class ordering."""
    qs = list(E._collect("QUERIES"))
    current_round, latest = E.grading_history()
    order = E.prefix_order(qs)
    assert sorted(order) == sorted(qs)  # a permutation, nothing dropped
    reg = {n: i for i, n in enumerate(qs)}
    keys = [E._policy_key(n, reg[n], current_round, latest) for n in order]
    assert keys == sorted(keys)
    # reds (if any) strictly precede everything else
    reds = {n for n, (r, g) in latest.items() if not g}
    if reds:
        k = max(order.index(n) for n in reds)
        assert set(order[: k + 1]) >= reds
    # never-graded precede all graded greens except ceiling-hit core
    never = [n for n in order if n not in latest]
    if never:
        last_never = order.index(never[-1])
        for n in order[: last_never + 1]:
            row = latest.get(n)
            if row is None or not row[1]:
                continue
            assert (
                n in E._REFRESH_CORE
                and current_round - row[0] >= E._REFRESH_MAX_AGE
            ), f"graded-green {n} ahead of never-graded names"


def test_queries_and_oracles_share_the_order():
    qs = E.queries()
    osql = E.oracle_sql()
    q_names = list(qs)
    o_names = [n for n in osql if n in qs]
    # oracle dict iterates in the same relative order for shared keys
    assert [n for n in q_names if n in osql] == o_names


def test_malformed_artifact_is_ignored(tmp_path, capsys):
    """A corrupt CORRECTNESS file must not break queries() for the driver,
    but its round number still advances current_round (a torn artifact is
    a round that HAPPENED — treating it as one that never happened would
    loosen the CDC refresh ceiling and stall red re-queueing)."""
    good = {"q_a": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None}}
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(good))
    (tmp_path / "CORRECTNESS_r04.json").write_text("{not json")
    current_round, latest = E.grading_history(str(tmp_path))
    assert current_round == 5  # torn r04 still counts as a round
    assert latest == {"q_a": (3, True)}  # ...but contributes no rows
    assert "CORRECTNESS_r04.json" in capsys.readouterr().err
    # non-dict payload behaves the same way
    (tmp_path / "CORRECTNESS_r05.json").write_text("[1, 2]")
    current_round, latest = E.grading_history(str(tmp_path))
    assert current_round == 6
    assert latest == {"q_a": (3, True)}
