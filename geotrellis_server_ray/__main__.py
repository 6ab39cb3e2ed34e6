"""CLI entrypoint — the ``ray job submit`` surface.

    python -m geotrellis_server_ray --query tile_assign \
        --sf /root/testdata/sf0.01 --out /tmp/out_dir

Runs one named registry query (or the flagship with --query flagship) and
writes the result as parquet. This module OWNS its Ray session (guarded
init, shutdown at exit) — the only places allowed to, alongside bench.py and
the test fixture. On a real cluster the same command runs under
``ray job submit --working-dir .`` with RAY_ADDRESS pointing at the head.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="geotrellis_server_ray")
    ap.add_argument("--query", default=None,
                    help="registry query name (see --list), or 'flagship'")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="input table directory")
    ap.add_argument("--out", default=None, help="parquet output directory (default: print row count only)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--list", action="store_true", help="list query names and exit")
    ap.add_argument("--capabilities", choices=["wms", "wmts", "wcs", "wcs-describe"],
                    default=None,
                    help="print a GetCapabilities / DescribeCoverage XML document "
                         "for the demo catalog and exit")
    args = ap.parse_args(argv)

    from .pipelines.registry import QUERIES

    if args.list:
        for name in QUERIES:
            print(name)
        return 0
    if args.capabilities:
        from .functions import capabilities as caps
        from .pipelines.serving import _CATALOG

        layers = [{"name": r["name"], "xmin": r["xmin"], "ymin": r["ymin"],
                   "xmax": r["xmax"], "ymax": r["ymax"]}
                  for r in _CATALOG.to_dict("records")]
        fn = {"wms": caps.wms_capabilities, "wmts": caps.wmts_capabilities,
              "wcs": caps.wcs_capabilities,
              "wcs-describe": caps.wcs_describe_coverage}[args.capabilities]
        print(fn(layers))
        return 0
    if args.query is None:
        ap.error("--query is required unless --list is given")
    if args.query != "flagship" and args.query not in QUERIES:
        print(f"unknown query: {args.query!r} (use --list)", file=sys.stderr)
        return 2  # validate before paying Ray startup
    if args.out is not None:
        import os

        if os.path.isdir(args.out) and os.listdir(args.out):
            print(f"--out {args.out!r} is not empty; refusing to mix runs "
                  "(write_parquet appends files, which would double-count)", file=sys.stderr)
            return 2

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # address=None honors RAY_ADDRESS (the ray-job-submit path attaches
        # to the cluster head; this sandbox presets RAY_ADDRESS=local)
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus is not None:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    try:
        t0 = time.perf_counter()
        if args.query == "flagship":
            from .pipelines.geo import flagship

            ds = flagship(args.sf)
        else:
            ds = QUERIES[args.query][0](args.sf)
        if args.out is not None:
            if isinstance(ds, rd.Dataset):
                ds.write_parquet(args.out)
                n = rd.read_parquet(args.out).count()
            else:  # pandas DataFrame or pyarrow Table result
                import pyarrow as pa
                import pyarrow.parquet as pq

                import os

                os.makedirs(args.out, exist_ok=True)
                tbl = ds if isinstance(ds, pa.Table) else pa.Table.from_pandas(
                    ds, preserve_index=False)
                pq.write_table(tbl, f"{args.out}/part-00000.parquet")
                n = len(ds)
        else:
            n = ds.count() if isinstance(ds, rd.Dataset) else len(ds)
        print(json.dumps({"query": args.query, "rows": int(n),
                          "sec": round(time.perf_counter() - t0, 3), "out": args.out}))
        return 0
    finally:
        if owns_session:  # never tear down a caller-owned session
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
