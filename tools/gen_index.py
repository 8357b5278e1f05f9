#!/usr/bin/env python3
"""Generate INDEX.md — the one-page per-query audit table (round-11
verdict item 8): query -> declaring file:line -> spec files -> latest
measured sf0.1 / sf1 / sf10 cells, so a judge can audit without
reconstructing the mapping from COVERAGE.md + SURVEY.md + BASELINE.md.

Inputs (all already in the repo):
  - bench_out.json                  the latest FULL declared-suite run
                                    (fixed path; partial runs never
                                    overwrite it) -> query list + sf0.1 s
  - bench_out.sf1.*.json            stamped scale runs; for each query the
    bench_out.sf10.*.json           NEWEST artifact containing it wins
  - src/main/scala/graft/**.scala   first occurrence of the query-name
                                    string literal = the declaration site
  - src/test/scala/graft/*.scala    spec files naming the query id

Usage: python3 tools/gen_index.py   (writes INDEX.md at the repo root)
"""
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Bench action changed count() -> noop write at this commit epoch
# (r16, VERDICT r15 what's-wrong 1): cells stamped BEFORE it measured a
# column-pruned plan and are NOT comparable — they must never mix into
# the re-pinned table. Old stamps stay on disk for the archived
# old-action trend table (BASELINE r16 addendum).
ACTION_EPOCH = 1786882178


def load_flagged(doc):
    """query -> True when the cell's WINNING rep ran at loadavg > 2x the
    run's own MEDIAN per-rep load (min 2.0). The reference must be the
    run itself, not an absolute number or the start load: a 32-thread
    Spark suite is its own load (this box idles the 1-min runqueue in
    the teens mid-suite; the driver box sits near 4), so only a cell
    whose load stands out against the run's typical self-load is
    evidence of FOREIGN contention — the r16 q72/q125 spike signature
    (both reps inflated at loadavg 4+ on a run whose median was ~1-2,
    vs 2.95/3.23 s quiet at the same HEAD)."""
    all_loads = sorted(l for d in (doc.get("diag") or {}).values()
                       for l in d.get("load", []) if l >= 0)
    if not all_loads:
        return {}
    median = all_loads[len(all_loads) // 2]
    thresh = max(2.0, 2.0 * median)
    flags = {}
    for name, d in (doc.get("diag") or {}).items():
        loads = [l for l in d.get("load", []) if l >= 0]
        reps = [r for r in d.get("reps", []) if r >= 0]
        if not loads:
            flags[name] = False
            continue
        # the load snapshot taken just before the winning (min) rep, when
        # the two sequences align; conservatively min(loads) otherwise
        if len(loads) == len(reps) and reps:
            win_load = loads[reps.index(min(reps))]
        else:
            win_load = min(loads)
        flags[name] = win_load > thresh
    return flags


def newest_cells(sf_label):
    """(query -> seconds, query -> winning stamp path, query -> load
    flag) from the newest stamped artifact that has it, new-action
    stamps only."""
    out = {}
    prov = {}
    lflag = {}
    skipped_old_action = 0
    skipped_unparseable = 0
    def stamp(p):
        # skip (sort first, i.e. oldest) files whose stamp segment does
        # not parse instead of aborting the whole INDEX generation
        try:
            return int(p.rsplit(".", 2)[1])
        except ValueError:
            return -1
    # root stamps are the current round's; bench_evidence/<round>/ holds
    # prior rounds' (repo-hygiene home since r15) — the epoch stamp in
    # the filename orders across both, newest wins either way
    root_files = glob.glob(os.path.join(REPO, f"bench_out.{sf_label}.*.json"))
    root_names = {os.path.basename(p) for p in root_files}
    # a stamp copied into bench_evidence/ during the SAME round also still
    # sits at the root — prefer the root copy so the ᵉ inherited-marker
    # means "prior round only", not "archived this round"
    ev_files = [p for p in glob.glob(os.path.join(
        REPO, "bench_evidence", "*", f"bench_out.{sf_label}.*.json"))
        if os.path.basename(p) not in root_names]
    files = sorted(root_files + ev_files, key=stamp)
    for path in files:  # oldest -> newest; newer values overwrite
        if stamp(path) < 0:
            # ADVICE r16: an unparseable stamp segment must not BYPASS the
            # action-epoch guard (stamp() = -1 fell outside the old
            # `0 <= s < EPOCH` range and leaked pre-noop cells in)
            skipped_unparseable += 1
            continue
        if stamp(path) < ACTION_EPOCH:
            skipped_old_action += 1
            continue
        try:
            doc = json.load(open(path))
        except (ValueError, OSError):
            continue
        flags = load_flagged(doc)
        for name, sec in doc.get("queries", {}).items():
            if isinstance(sec, (int, float)) and sec >= 0:
                out[name] = sec
                prov[name] = path
                lflag[name] = flags.get(name, False)
    if skipped_old_action:
        print(f"[gen_index] {sf_label}: skipped {skipped_old_action} "
              "pre-noop-action stamp file(s) (not comparable)")
    if skipped_unparseable:
        print(f"[gen_index] {sf_label}: skipped {skipped_unparseable} "
              "artifact(s) with unparseable filename stamps (cannot "
              "verify bench action — excluded)")
    # ADVICE r15: a scale the current round forgot to re-stamp would
    # silently inherit a prior round's number (measured at an old HEAD)
    # — warn with provenance when the winner lives in bench_evidence
    inherited = sorted({os.path.relpath(p, REPO) for p in prov.values()
                        if os.sep + "bench_evidence" + os.sep in p})
    for p in inherited:
        n = sum(1 for v in prov.values() if v.endswith(os.path.basename(p))
                and os.sep + "bench_evidence" + os.sep in v)
        print(f"[gen_index] WARNING {sf_label}: {n} cell(s) inherited from "
              f"prior-round stamp {p} — re-stamp this scale at HEAD")
    return out, prov, lflag


def declaration_sites(names):
    """query -> repo-relative file:line of its first name-literal use,
    preferring src/main/scala/graft/queries (the declaration homes)."""
    wanted = set(names)
    sites = {}
    roots = [os.path.join(REPO, "src/main/scala/graft/queries"),
             os.path.join(REPO, "src/main/scala/graft")]
    for root in roots:
        for path in sorted(glob.glob(os.path.join(root, "**/*.scala"),
                                     recursive=True)):
            rel = os.path.relpath(path, REPO)
            with open(path, encoding="utf-8") as fh:
                for lineno, line in enumerate(fh, 1):
                    for match in re.findall(r'"(q\d+[a-z]?_[a-z0-9_]+)"', line):
                        if match in wanted and match not in sites:
                            sites[match] = f"{rel}:{lineno}"
        if len(sites) == len(wanted):
            break
    return sites


def spec_files(names):
    """query -> comma list of spec basenames that mention its qNN id."""
    texts = {}
    for path in sorted(glob.glob(os.path.join(REPO, "src/test/scala/graft/*.scala"))):
        texts[os.path.basename(path)] = open(path, encoding="utf-8").read()
    out = {}
    for name in names:
        short = name.split("_", 1)[0]
        pattern = re.compile(rf"\b({re.escape(name)}|{re.escape(short)})\b")
        hits = [base for base, text in texts.items() if pattern.search(text)]
        # every declared query is gated by the DuckDB oracle hash compare
        # (Verify + tools/check_oracle.py); named specs are ADDITIONAL
        shown = ",".join(h.replace("Spec.scala", "") for h in hits[:3])
        if len(hits) > 3:
            shown += f" +{len(hits) - 3} more"
        out[name] = shown or "oracle"
    return out


def fmt(sec):
    return f"{sec:.2f}" if sec is not None else "—"


# the four queries sharing the per-process CC-label memo: their sf0.1
# cells (full-suite run, memo ON) are warm label-table reads, not query
# costs — marked `*` in the table, with the memo-OFF cold cells shown in
# their own column (VERDICT r13 item 4: the bare warm number next to the
# cold sf1/sf10 siblings invited misreading)
MEMO_WARM = {"q39_dedup_clusters", "q50_cluster_select",
             "q62_dedup_profile", "q80_leakage_split"}

# declared per-query sf10 ceilings (VERDICT r13 item 7 / BASELINE r13
# addendum 13): cells marked `†` are measured output-/compute-bound with
# no plan win available inside the query's declared contract
CEILINGS = {
    "q27p_minhash_pairs": "pair-output-bound: the declared result IS the "
        "candidate pair set; sf10 cost is writing it, not finding it",
    "q44_simhash_pairs": "compute-bound on the 64-bit fingerprint build; "
        "the banded pair join itself is linear in band rows",
    "q91_span_dedup_rewrite": "rewrite-output-bound: emits the full "
        "rewritten corpus text by contract",
    # VERDICT r14 item 6: the two graph cells attributed — both run on an
    # IN-QUERY-GENERATED fixed 2000-node graph (q75 precedent), so their
    # cost is data-independent by construction and identical at every sf;
    # what the cell prices is the distributed loop's fixed floor, not data
    "q103_pagerank": "job-count-bound: 10 integer-Pregel supersteps x "
        "3 exchanges each over the fixed in-query graph — scheduler/"
        "planning floor, same cell at every sf (the declared contract "
        "pins the 10-iteration recurrence)",
    "q108_triangles": "job-count-bound: degree-oriented wedge join over "
        "the same fixed in-query graph — exchange/planning floor, same "
        "cell at every sf; the sqrt(m) orientation is what scales, the "
        "cell prices the floor",
    # r16: cells first PRICED by the noop-write action (the count()
    # action pruned their output projections entirely — BASELINE r16
    # addenda 1/6); both emit corpus-sized derived payloads by contract
    "q10_stats_standardize": "output-contractual: the result IS the "
        "standardized flat buffer for every record — the projection the "
        "old action pruned; linear in tensor bytes (sf1->sf10: 2.35->15.2 s "
        "for 10x data)",
    "q66_dup_spans": "rewrite-output-bound (q91's class): emits the "
        "per-document duplicate-span structures by contract; linear "
        "sf1->sf10 (3.7->37.7 s for 10x data)",
}


def main():
    bench = json.load(open(os.path.join(REPO, "bench_out.json")))
    # ADVICE r16: the fixed-path bench_out.json carries no filename stamp,
    # so a stale pre-noop-action full-suite run could silently populate
    # the main sf0.1 column under a header claiming new-action cells.
    # Since r17 Bench embeds action+stamp in the artifact; refuse to
    # build INDEX from anything that predates the action change.
    b_stamp = bench.get("stamp", -1)
    b_action = bench.get("action", "")
    if b_action != "noop-write" or b_stamp < ACTION_EPOCH:
        raise SystemExit(
            f"[gen_index] FATAL: bench_out.json action={b_action!r} "
            f"stamp={b_stamp} predates ACTION_EPOCH={ACTION_EPOCH} (or "
            "lacks the r17 action tag) — re-run the full suite on the "
            "driver dir before regenerating INDEX.md")
    sf01 = {k: v for k, v in bench["queries"].items() if v >= 0}
    flag01 = load_flagged(bench)
    names = sorted(sf01)
    sf1, prov1, flag1 = newest_cells("sf1")
    sf10, prov10, flag10 = newest_cells("sf10")
    cold01, provc, flagc = newest_cells("cold_sf0.1")
    # provenance marker: ᵉ = the cell's winning stamp lives in
    # bench_evidence/ (a prior round), not the repo root (this round)
    def ev(prov, name):
        p = prov.get(name, "")
        return "ᵉ" if os.sep + "bench_evidence" + os.sep in p else ""
    # ᴸ = the cell's WINNING rep ran at loadavg > 2x the run's median
    # per-rep load — foreign contention relative to the run's own
    # self-load, so the min is a contended observation (VERDICT r16 item
    # 4; ADVICE r17 aligned this comment with the implemented rule).
    # Caveat: a run contended END-TO-END self-normalizes and flags
    # nothing — box_factor is the whole-run contention signal.
    def lf(flags, name):
        return "ᴸ" if flags.get(name) else ""
    sites = declaration_sites(names)
    specs = spec_files(names)

    lines = [
        "# INDEX — per-query audit table (generated by tools/gen_index.py)",
        "",
        f"{len(names)} declared queries. sf0.1 cells are the latest FULL-suite",
        "run (bench_out.json); sf1/sf10 cells are each query's newest stamped",
        "scale artifact (— = not in any). All cells are NEW-ACTION (noop-write)",
        "measurements — pre-r16 count()-action stamps are excluded as not",
        "comparable (VERDICT r15 what's-wrong 1). `ᵉ` = cell inherited from a",
        "bench_evidence/ prior-round stamp, not re-stamped at this HEAD.",
        "`ᴸ` = load-suspect: the winning rep's loadavg exceeded 2x the run's",
        "own median per-rep load — foreign contention relative to the run's",
        "self-load; re-stamp on a quiet box before reading the cell as a",
        "regression (VERDICT r16 item 4).",
        "Spec column lists test files naming",
        "the query id (every query is additionally oracle-hash-gated). Regenerate: `python3 tools/gen_index.py`.",
        "",
        "`*` = MEMO-WARM cell: the four CC-chain rows (q39/q50/q62/q80)",
        "share one materialized label stage per process, so their sf0.1",
        "full-suite cells are warm label-table reads — NOT the query's",
        "cost. The `sf0.1 cold` column carries the same queries stamped",
        "under GRAFT_CC_MEMO=off (each cell a standalone chain recompute,",
        "the same accounting as the sf1/sf10 cells); methodology in",
        "BASELINE r13 addendum 2.",
        "",
        "`†` = declared ceiling: measured output-/compute-/job-count-bound",
        "at sf10 with no plan win available inside the query's contract —",
        "",
    ] + [f"  - {q}: {note}" for q, note in sorted(CEILINGS.items())] + [
        "",
        "| query | declared at | specs | sf0.1 s | sf0.1 cold s | sf1 s | sf10 s |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in names:
        warm = "\\*" if name in MEMO_WARM and name in sf01 else ""
        ceil = "†" if name in CEILINGS and name in sf10 else ""
        lines.append(
            f"| {name} | {sites.get(name, '—')} | {specs[name]} "
            f"| {fmt(sf01.get(name))}{warm}{lf(flag01, name)} "
            f"| {fmt(cold01.get(name))}{ev(provc, name)}{lf(flagc, name)} "
            f"| {fmt(sf1.get(name))}{ev(prov1, name)}{lf(flag1, name)} "
            f"| {fmt(sf10.get(name))}{ev(prov10, name)}{lf(flag10, name)}{ceil} |")
    out = os.path.join(REPO, "INDEX.md")
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(lines)} lines, {len(names)} queries")


if __name__ == "__main__":
    main()
