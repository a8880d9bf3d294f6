"""Invariance-artifact guard (r12).

`scripts_invariance_sweep.py` promotes the physical-invariance ritual
into a committed artifact (INVARIANCE_r{N}.json).  An artifact is only
evidence if it can't rot silently: this guard pins that the LATEST
committed artifact (a) parses, (b) covers the full matrix the
script defines (no quietly-skipped cell), (c) is green in every cell,
and (d) certified the CURRENT registry size — a sweep that predates a
registry change is stale evidence and must be re-run.
"""

import glob
import json
import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_artifact():
    paths = glob.glob(os.path.join(_REPO, "INVARIANCE_r*.json"))
    assert paths, "no INVARIANCE_r*.json artifact committed"
    rnd = lambda p: int(re.search(r"INVARIANCE_r(\d+)\.json$", p).group(1))
    return max(paths, key=rnd)


def test_latest_invariance_artifact_is_green_and_full_matrix():
    import scripts_invariance_sweep as sweep

    with open(_latest_artifact()) as f:
        art = json.load(f)
    assert art.get("ok") is True, "committed invariance artifact is not green"
    missing = sorted(set(sweep._CONFIGS) - set(art.get("configs", {})))
    assert not missing, (
        f"artifact skipped matrix cell(s) {missing} — commit a full "
        "(non --quick) sweep"
    )
    for name, cell in art["configs"].items():
        assert cell.get("ok") is True, f"cell {name} not green: {cell}"
        assert cell.get("n_match") == cell.get("n_queries"), name
        assert cell.get("rows_only") == 0, (
            f"cell {name} has rows-only entries — every query is "
            "oracle-backed; a rows-only row means an oracle went missing"
        )


def test_spill_cell_actually_spilled():
    """The forced-spill cell (r13) is only evidence if the external-spill
    paths genuinely ran: the artifact must record nonzero spilled bytes
    from the UI REST API.  A green cell with zero spill would mean the
    thresholds silently stopped forcing the external paths (e.g. a Spark
    upgrade renamed a conf key) — green-but-vacuous, the exact rot class
    this guard family exists to catch."""
    with open(_latest_artifact()) as f:
        art = json.load(f)
    cell = art["configs"].get("spill")
    assert cell is not None, "spill cell missing from latest artifact"
    spill = cell.get("spill") or {}
    assert "error" not in spill, f"spill measurement failed: {spill}"
    assert spill.get("memory_bytes_spilled", 0) > 0, (
        "spill cell recorded zero memory bytes spilled — the forced "
        "thresholds are no longer reaching the external-spill paths"
    )


def test_latest_invariance_artifact_covers_current_registry():
    from data_engineering_etl_demo_spark.plans import all_specs

    with open(_latest_artifact()) as f:
        art = json.load(f)
    n_reg = len(all_specs())
    stale = {
        name: cell.get("n_queries")
        for name, cell in art["configs"].items()
        if cell.get("n_queries") != n_reg
    }
    assert not stale, (
        f"invariance artifact certified a different registry size than "
        f"the current {n_reg} — re-run scripts_invariance_sweep.py: {stale}"
    )


def test_host_tz_cell_actually_shifted_the_environment():
    """The host-TZ cell (r14) is only evidence if the shifted zone
    genuinely reached the child: the artifact must record a non-UTC JVM
    default zone (what an unpinned session would have inherited) while
    the session conf reads UTC.  A green cell where TZ failed to
    propagate would prove nothing about the contract defeating the
    environment."""
    with open(_latest_artifact()) as f:
        art = json.load(f)
    cell = art["configs"].get("host-tz")
    assert cell is not None, "host-tz cell missing from latest artifact"
    tz = cell.get("host_tz") or {}
    assert tz.get("jvm_default_tz") not in (None, "UTC", "Etc/UTC"), (
        f"host-tz cell's JVM default zone is not shifted — TZ did not "
        f"propagate to the child process; the cell is vacuous: {tz}"
    )
    assert tz.get("session_tz") == "UTC", (
        f"host-tz cell's session is not pinned UTC — it is not testing "
        f"the contract: {tz}"
    )


def test_storage_layout_cell_actually_shifted_the_bytes():
    """The storage-layout cell (r14) is only evidence if the rewrite
    genuinely produced a different physical encoding: the recorded
    layout must show the biggest table split into many row groups
    (the generator writes ONE per table) with the shifted compression.
    A green cell over files that silently kept the generator's layout
    would prove nothing about encoding independence."""
    with open(_latest_artifact()) as f:
        art = json.load(f)
    cell = art["configs"].get("storage-layout")
    assert cell is not None, "storage-layout cell missing from latest artifact"
    layout = cell.get("storage_layout") or {}
    li = layout.get("lineitem.parquet") or {}
    assert li.get("row_groups", 0) > 50, (
        f"rewritten lineitem has too few row groups — the layout shift "
        f"did not happen: {li}"
    )
    assert li.get("compression") == "ZSTD", (
        f"rewritten lineitem is not ZSTD — the layout shift did not "
        f"happen: {li}"
    )


def test_arrow_batch_cell_actually_shrank_the_batches():
    """The arrow-batch cell (r14) is only evidence if the 64-row conf
    genuinely took effect: the recorded probe (10k rows through one
    mapInPandas partition) must have seen many batches — at the default
    10,000-row batching it would see 1."""
    with open(_latest_artifact()) as f:
        art = json.load(f)
    cell = art["configs"].get("arrow-batch")
    assert cell is not None, "arrow-batch cell missing from latest artifact"
    probe = cell.get("arrow_probe") or {}
    assert probe.get("observed_batches", 0) > 10, (
        f"arrow-batch probe saw too few batches — the maxRecordsPerBatch "
        f"conf did not take effect; the cell is vacuous: {probe}"
    )


def test_no_codegen_cell_actually_disabled_codegen():
    """The no-codegen cell (r14) is only evidence if whole-stage codegen
    was genuinely off: the recorded probe plan (an aggregate that is
    always whole-stage-generated when enabled) must carry no
    WholeStageCodegen node."""
    with open(_latest_artifact()) as f:
        art = json.load(f)
    cell = art["configs"].get("no-codegen")
    assert cell is not None, "no-codegen cell missing from latest artifact"
    probe = cell.get("codegen_probe") or {}
    assert probe.get("plan_has_wscg") is False, (
        f"no-codegen probe plan still shows WholeStageCodegen — the conf "
        f"did not take effect; the cell is vacuous: {probe}"
    )
