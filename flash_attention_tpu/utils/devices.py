"""Device discovery CLI — the analog of the reference's gc-monitor probe
(/root/reference/.gradient/available_ipus.py:6-12).

  python -m flash_attention_tpu.utils.devices          # human-readable
  python -m flash_attention_tpu.utils.devices --count  # just the number
"""

from __future__ import annotations

import argparse
import json


def device_info() -> list[dict]:
    import jax

    out = []
    for d in jax.devices():
        out.append(
            {
                "id": d.id,
                "platform": d.platform,
                "kind": getattr(d, "device_kind", "unknown"),
                "process": d.process_index,
            }
        )
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--count", action="store_true")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()
    info = device_info()
    if args.count:
        print(len(info))
    elif args.json:
        print(json.dumps(info))
    else:
        for d in info:
            print(f"device {d['id']}: {d['kind']} ({d['platform']}, proc {d['process']})")


if __name__ == "__main__":
    main()
