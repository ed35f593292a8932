#!/usr/bin/env python3
"""Mechanically regenerate BENCH.md's per-query table + headline from a
graft.Bench JSON line, so the document can never disagree with the measured
record (the round-1/round-2 failure mode: hand-copied numbers from a
different local run).

Usage:
  sbt -batch "runMain graft.Bench" | grep '"metric"' | sed 's/^\[info\] //' > /tmp/bench.json
  python3 tools/benchmd.py /tmp/bench.json

Rewrites the block between the AUTOGEN markers in BENCH.md in place.
"""
import json
import sys

BEGIN = "<!-- AUTOGEN:BENCH-TABLE (tools/benchmd.py) -->"
END = "<!-- AUTOGEN:END -->"


def main(path: str, bench_md: str = "BENCH.md") -> None:
    with open(path) as f:
        d = json.loads(f.read().strip())
    qs = dict(sorted(d["queries"].items()))
    lines = [
        BEGIN,
        "",
        f"**Total {d['value']:.1f} s over {len(qs)} queries** "
        f"(sf `{d['sf']}`, local[{d['cpus']}], every query warmed once at "
        f"`{d.get('warmup_dir', 'n/a')}` first, noop-sink-forced, one JVM, "
        "driver-identical harness). This table is generated from the bench "
        "JSON by `tools/benchmd.py` — it cannot drift from the record.",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for k, v in qs.items():
        lines.append(f"| {k} | {v:.2f} |")
    lines.append(f"| **total** | **{d['value']:.2f}** |")
    errors = d.get("errors") or {}
    if errors:
        lines.append("")
        lines.append("**FAILED QUERIES:** " + json.dumps(errors))
    tele = d.get("telemetry") or {}
    if tele:
        lines.append("")
        lines.append(
            f"Run environment: heap_max {d.get('heap_max_mb', '?')} MiB, "
            f"warmup pass {d.get('warmup_sec', 0):.0f} s, cooldown "
            f"{d.get('cooldown_sec', 0)} s (cpu {d.get('mhz_before_cooldown', -1):.0f} "
            f"-> {d.get('mhz_after_cooldown', -1):.0f} MHz across it)."
        )
        lines.append("")
        lines.append(
            "Per-query telemetry for the slowest queries (gc = driver+executor "
            "GC inside the window; task = summed executor task time; proc/other "
            "= this process vs rest-of-host CPU seconds from /proc/stat; MHz "
            "sampled DURING the query — a drop means frequency throttling while "
            "it ran):")
        lines.append("")
        lines.append("| query | wall s | task s | gc s | proc cpu s | other cpu s | MHz mean/min | heap MiB |")
        lines.append("|---|---|---|---|---|---|---|---|")
        slowest = sorted(qs.items(), key=lambda kv: -kv[1])[:8]
        for k, v in slowest:
            t = tele.get(k)
            if not t:
                continue
            lines.append(
                f"| {k} | {v:.2f} | {t['task_sec']:.2f} | {t['gc_sec']:.2f} "
                f"| {t['proc_cpu_sec']:.2f} | {t['other_cpu_sec']:.2f} "
                f"| {t['mhz_mean']:.0f}/{t['mhz_min']:.0f} | {t['heap_mb']} |")
    lines.append("")
    lines.append(
        f"Flagship interleaved-docs pipeline (q16 PIP join + q17 tile "
        f"assignment): {d['flagship_sec']:.2f} s over {d['n_docs']} docs = "
        f"{d['flagship_docs_per_sec']:.0f} docs/s at this (overhead-dominated) "
        "scale; see the ScalingBench section for the throughput-representative "
        "number."
    )
    lines.append("")
    lines.append(END)
    block = "\n".join(lines)

    with open(bench_md) as f:
        md = f.read()
    if BEGIN in md and END in md:
        pre = md.split(BEGIN)[0]
        post = md.split(END, 1)[1]
        md = pre + block + post
    else:
        md = md.rstrip() + "\n\n" + block + "\n"
    with open(bench_md, "w") as f:
        f.write(md)
    print(f"BENCH.md table regenerated: total {d['value']:.1f}s, "
          f"{len(qs)} queries, {len(errors)} errors")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "BENCH.md")
