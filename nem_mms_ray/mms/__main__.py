"""CLI mirroring the reference's command surface
(/root/reference/src/main.rs:92-152):

    python -m nem_mms_ray.mms parse <PATH> [--out OUT] [--layout reference|partitioned]
    python -m nem_mms_ray.mms info <PACKAGE>
    python -m nem_mms_ray.mms packages
    python -m nem_mms_ray.mms manage init <DIR>
    python -m nem_mms_ray.mms fetch <PACKAGE> <current|archive|historic> [--year Y --month M] [--plan-only]

`fetch` is plan-only in this environment (no network): it prints the exact
URLs the reference would download.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="nem-mms-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_parse = sub.add_parser("parse", help="parse MMS flat files to parquet")
    p_parse.add_argument("path")
    p_parse.add_argument("--out", default=None)
    p_parse.add_argument("--layout", choices=["partitioned", "reference"],
                         default="reference")

    p_info = sub.add_parser("info", help="show a package's schema")
    p_info.add_argument("package")

    sub.add_parser("packages", help="list supported packages")

    p_manage = sub.add_parser("manage", help="depository management")
    p_manage.add_argument("action", choices=["init", "status"])
    p_manage.add_argument("dir")

    p_fetch = sub.add_parser("fetch", help="plan nemweb downloads (no network here)")
    p_fetch.add_argument("package")
    p_fetch.add_argument("archive", choices=["current", "archive", "historic"])
    p_fetch.add_argument("--year", default="2009")
    p_fetch.add_argument("--month", default="07")

    args = ap.parse_args(argv)

    if args.cmd == "parse":
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from nem_mms_ray.mms.pipeline import parse_to_parquet

        # default output: input path with .parquet extension (main.rs:97-98)
        out = args.out or str(Path(args.path).with_suffix(".parquet"))
        summary = parse_to_parquet(args.path, out, layout=args.layout)
        print(json.dumps(summary, indent=2))
        ray.shutdown()
        return 0

    if args.cmd == "info":
        from nem_mms_ray.mms.schemas import package_info

        try:
            print(package_info(args.package))
        except KeyError:
            print(f"unknown package {args.package!r}", file=sys.stderr)
            return 2
        return 0

    if args.cmd == "packages":
        from nem_mms_ray.mms.schemas import PACKAGES

        for name in PACKAGES:
            print(name)
        return 0

    if args.cmd == "manage":
        from nem_mms_ray.mms.depository import DepositoryState

        if args.action == "init":
            st = DepositoryState.init(args.dir)
            print(f"initialised depository at {st.base}")
        else:
            st = DepositoryState.from_path(args.dir)
            print(json.dumps({"base": str(st.base), "files": [str(f.as_path()) for f in st.files]}, indent=2))
        return 0

    if args.cmd == "fetch":
        from nem_mms_ray.mms.fetch import historic_url, listing_url

        if args.archive == "historic":
            url = historic_url(args.package, args.year, args.month)
        else:
            url = listing_url(args.package, args.archive)
        if url is None:
            print(f"fetch not supported for {args.package} ({args.archive})",
                  file=sys.stderr)
            return 2
        print(url)
        print("(plan only: this environment has no network access)")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
