"""Interleaved A/B for the r12 media-fixture mint memos (guide §1):
runs the memo-bearing registered media queries with the PREVIOUS
per-document mint (pass the old __spark_entry__.py as argv[1], e.g.
``git show <rev>:__spark_entry__.py > /tmp/old_spark_entry.py``) and
the current memoized one, alternating A/B/A/B in one JVM so host-steal
bursts hit both arms equally. Wall time is the decided metric; the
memo is a narrow map-side change, so job/stage shapes are identical by
construction (the plans do not change).

Usage: python tools/ab_fixture_memo.py /tmp/old_spark_entry.py [sf_dir] [rounds]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_spark import get_spark  # noqa: E402


def load_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


QUERIES = [
    "media_decode_gif",
    "media_decode_flac",
    "media_audio_adpcm",
    "media_video_frames",
    "media_decode_jpeg",
    "media_decode_progressive",
    "media_phash_near_dups",
]


def main() -> None:
    old_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import __spark_entry__ as new_mod

    old_mod = load_module("old_spark_entry", old_path)

    spark = get_spark("ab-fixture-memo")
    spark.sparkContext.setLogLevel("ERROR")

    # warm Arrow workers + JVM on both arms once
    for mod in (old_mod, new_mod):
        for q in QUERIES:
            mod.queries()[q](spark, sf_dir).count()
        spark.catalog.clearCache()

    results: dict[str, dict[str, list[float]]] = {
        q: {"old": [], "new": []} for q in QUERIES
    }
    for r in range(rounds):
        for arm, mod in (("old", old_mod), ("new", new_mod)):
            for q in QUERIES:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                mod.queries()[q](spark, sf_dir).count()
                results[q][arm].append(round(time.perf_counter() - t0, 3))

    total_old = total_new = 0.0
    for q in QUERIES:
        o, n = results[q]["old"], results[q]["new"]
        total_old += min(o)
        total_new += min(n)
        print(
            f"{q:28s} old min {min(o):6.3f} med {sorted(o)[len(o)//2]:6.3f}"
            f" | new min {min(n):6.3f} med {sorted(n)[len(n)//2]:6.3f}"
            f" | min speedup {min(o)/min(n):4.2f}x   raw old={o} new={n}"
        )
    print(f"{'TOTAL (sum of mins)':28s} old {total_old:6.3f} | new {total_new:6.3f}"
          f" | {total_old/total_new:4.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
