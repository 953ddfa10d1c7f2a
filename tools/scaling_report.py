"""Render a `bench.py --scaling` pairs log as a BASELINE.md-ready table.

Collection mode (`GRAFT_SCALE_TARGET_VALID=n`) appends one JSON object per
completed pair to `GRAFT_SCALE_LOG`; this tool turns that log into the
markdown evidence block for the north rule's two-parallelism scaling
criterion: per-pair rows (raw + hw-normalized efficiency, in-run steal and
provisioning weather, validity verdict) plus medians over the valid subset.

Usage: python tools/scaling_report.py /tmp/graft_scaling_pairs_r3.jsonl
"""

import json
import sys


def _lo_hi(p: dict) -> tuple[int, int]:
    ns = sorted(int(k.split("_")[-1]) for k in p if k.startswith("sec_"))
    return ns[0], ns[-1]


def _med(vals):
    v = sorted(vals)
    n = len(v)
    if not n:
        return None
    return v[n // 2] if n % 2 else (v[n // 2 - 1] + v[n // 2]) / 2


def render_singles(recs: list[dict]) -> str:
    out = ["| # | side (CPUs) | sec | files/s | probe it/s | probe bw MB/s | steal "
           "| ft_in_run (med/min) | rb_in_run (med/min) | valid |",
           "|---|---|---|---|---|---|---|---|---|---|"]
    for i, r in enumerate(recs, 1):
        f = r.get("ft_in_run")
        ft = f"{f['med']:.0f}/{f['min']:.0f} MB/s" if f else "-"
        b = r.get("rb_in_run")
        rb = f"{b['med']:.0f}/{b['min']:.0f} MB/s" if b else "-"
        sec = f"{r['sec']:.1f}" if r.get("sec") else f"({r.get('aborted')})"
        fps = f"{r['files_per_sec']:.0f}" if r.get("files_per_sec") else "-"
        st = f"{r['steal_frac']:.1%}" if r.get("steal_frac") is not None else "-"
        pr = f"{r['probe_iters']:.0f}" if r.get("probe_iters") else "-"
        bw = f"{r['probe_bw_mb_s']:.0f}" if r.get("probe_bw_mb_s") else "-"
        out.append(f"| {i} | {r['side']} | {sec} | {fps} | {pr} | {bw} | {st} | {ft} | {rb} "
                   f"| {'**yes**' if r.get('valid') else 'no'} |")
    sides = sorted({r["side"] for r in recs})
    if len(sides) == 2:
        lo, hi = sides
        lo_s = sorted(r["sec"] for r in recs if r["side"] == lo and r.get("valid"))
        hi_s = sorted(r["sec"] for r in recs if r["side"] == hi and r.get("valid"))
        lo_p = sorted(r["probe_iters"] for r in recs
                      if r["side"] == lo and r.get("valid") and r.get("probe_iters"))
        hi_p = sorted(r["probe_iters"] for r in recs
                      if r["side"] == hi and r.get("valid") and r.get("probe_iters"))
        if lo_s and hi_s:
            m_lo, m_hi = _med(lo_s), _med(hi_s)
            eff = m_lo / ((hi / lo) * m_hi)
            out.append("")
            out.append(
                f"Valid singles: {len(lo_s)}x{lo}-CPU (median {m_lo:.1f}s), "
                f"{len(hi_s)}x{hi}-CPU (median {m_hi:.1f}s). Pooled raw "
                f"efficiency = {m_lo:.1f} / ({hi // lo} x {m_hi:.1f}) = "
                f"**{eff:.3f}**.")
            lo_b = sorted(r["probe_bw_mb_s"] for r in recs
                          if r["side"] == lo and r.get("valid") and r.get("probe_bw_mb_s"))
            hi_b = sorted(r["probe_bw_mb_s"] for r in recs
                          if r["side"] == hi and r.get("valid") and r.get("probe_bw_mb_s"))
            if lo_b and hi_b:
                # one shared memory controller serves both pinned sets, so
                # bw(hi)/bw(lo) is the hardware ceiling for bandwidth-bound
                # stages (a real N->4N cluster scales the bus count with N)
                bwc = _med(hi_b) / _med(lo_b)
                out.append(
                    f"Memory-bandwidth probe medians: {_med(lo_b):.0f} -> "
                    f"{_med(hi_b):.0f} MB/s (bus ceiling {bwc:.2f}x of ideal "
                    f"{hi // lo}x); bw-normalized pooled efficiency = "
                    f"**{(m_lo / m_hi) / bwc:.3f}**.")
            if lo_p and hi_p:
                # hw ceiling: the raw-compute speedup the host granted the
                # pinned probe around the valid runs; pipeline speedup / hw
                # speedup separates pipeline scaling from hypervisor steal
                hw = _med(hi_p) / _med(lo_p)
                out.append(
                    f"HW probe medians: {_med(lo_p):.0f} -> {_med(hi_p):.0f} "
                    f"it/s (ceiling {hw:.2f}x of ideal {hi // lo}x); "
                    f"hw-normalized pooled efficiency = "
                    f"**{(m_lo / m_hi) / hw:.3f}**.")
        # STRICT subset: rb-decisive validity admits runs whose first-touch
        # was throttled, and those are NOT mutually comparable (two rb-valid
        # 8-CPU runs on identical input measured 452.7s at ft med 30 vs
        # 1079.6s at ft med 10 — provisioning-starved windows punish the
        # allocation-heavy score stage superlinearly). The like-for-like
        # reading pools only singles whose in-run ft median also cleared
        # the calm threshold.
        def _strict(r):
            f = r.get("ft_in_run")
            return r.get("valid") and f and f["med"] >= 30.0

        s_lo = sorted(r["sec"] for r in recs if r["side"] == lo and _strict(r))
        s_hi = sorted(r["sec"] for r in recs if r["side"] == hi and _strict(r))
        if s_lo and s_hi:
            sm_lo, sm_hi = _med(s_lo), _med(s_hi)
            out.append(
                f"STRICT (ft med >= 30 MB/s in-run) singles: {len(s_lo)}x{lo}, "
                f"{len(s_hi)}x{hi}; pooled raw efficiency = {sm_lo:.1f} / "
                f"({hi // lo} x {sm_hi:.1f}) = **{sm_lo / ((hi / lo) * sm_hi):.3f}**.")
        elif lo_s and hi_s:
            out.append(
                f"STRICT (ft med >= 30 MB/s in-run) subset empty on "
                f"{'lo' if not s_lo else 'hi'} side so far.")
        # per-stage efficiency from the in-record stage marks (round 4:
        # every scaling record carries the timed pass's GRAFT_PROFILE marks)
        # — the decomposition that tells WHICH stage under-scales, replacing
        # two-point total-time floor fits that can misattribute
        stage_rows = _stage_table(recs, lo, hi)
        if stage_rows:
            out.append("")
            out.extend(stage_rows)
    return "\n".join(out)


def _stage_table(recs: list[dict], lo: int, hi: int) -> list[str]:
    def med_stages(side):
        per: dict = {}
        for r in recs:
            if r["side"] != side or not r.get("valid") or not r.get("stages"):
                continue
            for k, v in r["stages"].items():
                name = k.split(" (")[0]  # strip "(rows=... pairs=...)" suffix
                per.setdefault(name, []).append(v)
        return {k: _med(v) for k, v in per.items()}

    slo, shi = med_stages(lo), med_stages(hi)
    common = [k for k in slo if k in shi]
    if not common:
        return []
    out = [f"| stage | median sec_{lo} | median sec_{hi} | stage raw eff |",
           "|---|---|---|---|"]
    for k in common:
        eff = slo[k] / ((hi / lo) * shi[k]) if shi[k] else float("nan")
        out.append(f"| {k} | {slo[k]:.1f} | {shi[k]:.1f} | {eff:.3f} |")
    spills = [r.get("spilled_mb") or 0 for r in recs if r.get("valid")]
    if any(spills):
        out.append(f"\nObject-store spill observed: max {max(spills):.0f} MiB "
                   "across valid runs — a non-scaling I/O term; see bench.py "
                   "store sizing.")
    return out


def render(all_recs: list[dict]) -> str:
    if any("side" in r for r in all_recs):
        return render_singles(all_recs)
    # collection mode also logs skipped half-pairs (mid-pair gate / watchdog
    # aborts) — they carry no hi-side seconds and are excluded from the table
    skipped = [r for r in all_recs if r.get("skipped_pair")]
    pairs = [r for r in all_recs if not r.get("skipped_pair")]
    if not pairs:
        return (f"No complete pairs ({len(skipped)} skipped: "
                f"{[r['skipped_pair'] for r in skipped]})")
    lo, hi = _lo_hi(pairs[0])
    out = []
    out.append(
        f"| pair | sec_{lo} | sec_{hi} | files/s_{lo} | files/s_{hi} | raw eff "
        f"| hw eff | steal_{lo} | steal_{hi} | ft_in_run_{lo} | ft_in_run_{hi} | valid |"
    )
    out.append("|---|---|---|---|---|---|---|---|---|---|---|---|")
    for i, p in enumerate(pairs, 1):
        def ft(n):
            f = p.get(f"ft_in_run_{n}")
            return f"{f['med']:.0f} MB/s (min {f['min']:.0f})" if f else "-"

        out.append(
            f"| {i} | {p[f'sec_{lo}']:.1f} | {p[f'sec_{hi}']:.1f} "
            f"| {p[f'files_per_sec_{lo}']:.0f} | {p[f'files_per_sec_{hi}']:.0f} "
            f"| {p['efficiency']:.3f} | {p.get('efficiency_vs_hw', float('nan')):.3f} "
            f"| {p.get(f'steal_frac_{lo}', float('nan')):.1%} "
            f"| {p.get(f'steal_frac_{hi}', float('nan')):.1%} "
            f"| {ft(lo)} | {ft(hi)} "
            f"| {'**yes**' if p.get('valid') else 'no'} |"
        )
    valid = [p for p in pairs if p.get("valid")]
    out.append("")
    out.append(
        f"Pairs: {len(pairs)} complete ({len(skipped)} skipped by the "
        f"mid-pair gate / watchdog), {len(valid)} valid. "
        f"Median raw efficiency (valid pairs): "
        f"{_med([p['efficiency'] for p in valid])!r}; "
        f"median hw-normalized (valid pairs): "
        f"{_med([p.get('efficiency_vs_hw') for p in valid])!r}; "
        f"median raw (all pairs): {_med([p['efficiency'] for p in pairs])!r}."
    )
    return "\n".join(out)


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_scaling_pairs.jsonl"
    with open(path) as f:
        pairs = [json.loads(line) for line in f if line.strip()]
    if not pairs:
        print("no pairs in log", file=sys.stderr)
        sys.exit(1)
    print(render(pairs))


if __name__ == "__main__":
    main()
