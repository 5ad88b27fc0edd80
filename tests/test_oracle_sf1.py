"""sf1 probe artifact integrity (VERDICT r13 #6). The battery itself
is a tool run (`python tools/oracle_sf1.py` — ~1h at sf1, generates
its corpus on first use); this test keeps the COMMITTED artifact
honest without Spark: every battery row is a registered+oracled query,
every exact row in the newest committed artifact is green, the single
allowed non-exact row is the documented oracle-engine-OOM funnel, and
the cap evidence is present and actually shows truncation engaged."""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _newest_artifact() -> Path | None:
    arts = sorted(REPO.glob("ORACLE_SF1_r*.json"))
    return arts[-1] if arts else None


def test_sf1_battery_names_registered():
    sys.path.insert(0, str(REPO / "tools"))
    import oracle_sf1

    from data_warehouse_implementation_spark import registry

    for name in oracle_sf1.SF1_BATTERY:
        assert name in registry._QUERIES, name
        assert name in registry._ORACLES, name
    assert set(oracle_sf1.CAP_EVIDENCE) <= set(oracle_sf1.SF1_BATTERY)


def test_sf1_artifact_green_and_caps_engaged():
    art = _newest_artifact()
    assert art is not None, "no committed ORACLE_SF1 artifact"
    d = json.loads(art.read_text())
    rows = {k: v for k, v in d.items() if not k.startswith("_")}
    assert rows, "artifact has no query rows"
    not_green = {
        k for k, v in rows.items() if v.get("hash_match") is not True
    }
    # the one allowed non-exact row must be explicitly rows-only with a
    # recorded Spark row count and a reason
    for k in not_green:
        v = rows[k]
        assert v.get("rows_only") is True and v.get("note"), (k, v)
        assert v.get("spark_rows"), k
    assert len(not_green) <= 1, sorted(not_green)
    caps = d.get("_caps", {})
    assert caps, "no cap-engagement evidence recorded"
    lsh = caps.get("embedding_lsh_bucket_stats")
    assert lsh and any(b["truncated_at_cap"] > 0 for b in lsh), (
        "LSH membership cap not engaged at sf1 — the probe lost its point"
    )
    sem = caps.get("embedding_semantic_dedup_stats")
    assert sem and any(c["n_truncated"] > 0 for c in sem)
    funnel = caps.get("corpus_curation_capped_funnel")
    if funnel:
        stages = {s["stage"]: s["n"] for s in funnel}
        assert stages["cap_per_source"] < stages["decontaminate"], (
            "per-source cap did not truncate"
        )
    meta = d.get("_meta", {})
    if meta.get("generator_version", 1) >= 2:
        # round-15 evidence rows (VERDICT r14 #3/#7): the sf1 corpus
        # must exercise a DEEPER derived SA depth than the driver
        # corpus, and the trained quantizer must truncate FEWER
        # members than the seed at the same per-cell cap
        sa = meta["sa_depth"]
        assert sa["sf1"]["derived_rounds"] > sa["sf0.1"]["derived_rounds"], sa
        assert sa["oracle_unroll_rounds"] >= sa["sf1"]["derived_rounds"], sa
        occ = {r["quantizer"]: r for r in caps["semdedup_occupancy_compare"]}
        assert occ["trained"]["truncated_at_cap"] < occ["seed"]["truncated_at_cap"], occ
        assert occ["trained"]["max_cell_members"] <= occ["seed"]["max_cell_members"], occ
