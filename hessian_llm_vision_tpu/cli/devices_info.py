"""Device diagnostics — the reference's per-rank GPU memory probe
(distributed_scratch.py:6-29) as a TPU-native CLI.

  python -m hessian_llm_vision_tpu.cli.devices_info [--cpu]
"""

from __future__ import annotations

import argparse
import json

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rows = []
    for d in jax.devices():
        row = {
            "id": d.id,
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "?"),
            "process": getattr(d, "process_index", 0),
        }
        try:
            stats = d.memory_stats() or {}
            for k in ("bytes_in_use", "bytes_limit", "peak_bytes_in_use"):
                if k in stats:
                    row[k] = stats[k]
        except Exception:
            pass
        rows.append(row)

    if args.json:
        print(json.dumps(rows, indent=2))
    else:
        print(f"backend: {jax.default_backend()}  devices: {len(rows)}  "
              f"processes: {jax.process_count()}")
        for r in rows:
            mem = ""
            if "bytes_in_use" in r:
                used = r["bytes_in_use"] / 2**30
                lim = r.get("bytes_limit", 0) / 2**30
                mem = f"  mem {used:.2f}/{lim:.2f} GiB"
            print(f"  [{r['id']}] {r['kind']} (process {r['process']}){mem}")
    return rows


if __name__ == "__main__":
    main()
