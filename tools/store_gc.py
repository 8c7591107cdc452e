"""Garbage-collect orphaned derived-dataset store entries.

The four write-once stores (borders / crawl / band / lm) key every entry
by layout version + producing-code source hash (+ corpus content
fingerprint), so editing a producer or hardening a fingerprint
orphans the old entries: they can never be SERVED again (the key no
longer matches), but they sit on disk forever — e.g. the round-10
borders key-format change and the round-11 fingerprint hardening each
left a generation of unreachable directories behind.

An entry is LIVE iff the current module could construct its name for
SOME corpus: it starts with the module's current
``{layout}_{algo-hash}`` prefix (for the band store's crawl_html
variant, ``{layout}_{algo}-c{crawl-algo}``). Entries with live
prefixes but unfamiliar fingerprints are KEPT — other sf_dirs /
scratch corpora are legitimately different fingerprints. ``.tmp.``
directories are in-flight builds; they are removed only with
``--tmp-too`` (safe on a quiescent host, not while a build races).

Dry-run by default; pass ``--apply`` to delete.

Usage: python tools/store_gc.py [--apply] [--tmp-too]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def live_prefixes() -> dict[str, list[str]]:
    """Store root → the entry-name prefixes the CURRENT code serves."""
    from ecmm428_pycart_spark.datapipe import band_store as bs
    from ecmm428_pycart_spark.datapipe import borders_store as os_
    from ecmm428_pycart_spark.datapipe import crawl_store as cs
    from ecmm428_pycart_spark.datapipe import lm_store as ls

    band_doc = f"{bs._LAYOUT_VERSION}_{bs._algo_version()}_"
    band_html = (f"{bs._LAYOUT_VERSION}_{bs._algo_version()}"
                 f"-c{cs._algo_version()}_")
    return {
        os_._store_root(): [
            f"{os_._LAYOUT_VERSION}_{os_._algo_version()}_"],
        cs._store_root(): [
            f"{cs._LAYOUT_VERSION}_{cs._algo_version()}_"],
        bs._store_root(): [band_doc, band_html],
        # the lm store's algo hash is per-variant (the dedup variant
        # folds exact_dup_groups), so each variant has its own prefix
        ls._store_root(): [
            f"{ls._LAYOUT_VERSION}_{ls._algo_version(v)}_"
            for v in ls._VARIANTS],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true",
                    help="actually delete (default: dry-run report)")
    ap.add_argument("--tmp-too", action="store_true",
                    help="also remove .tmp. in-flight dirs (only on a "
                         "quiescent host)")
    args = ap.parse_args()

    n_dead = n_live = 0
    for root, prefixes in live_prefixes().items():
        if not os.path.isdir(root):
            continue
        for entry in sorted(os.listdir(root)):
            path = os.path.join(root, entry)
            if not os.path.isdir(path) or entry.startswith("."):
                continue
            if ".tmp." in entry:
                if args.tmp_too:
                    print(f"TMP   {path}")
                    if args.apply:
                        shutil.rmtree(path, ignore_errors=True)
                continue
            if any(entry.startswith(p) for p in prefixes):
                n_live += 1
                continue
            n_dead += 1
            print(f"DEAD  {path}")
            if args.apply:
                shutil.rmtree(path, ignore_errors=True)
    print(f"# {n_live} live, {n_dead} orphaned"
          + ("" if args.apply else " (dry-run; pass --apply to delete)"))


if __name__ == "__main__":
    main()
