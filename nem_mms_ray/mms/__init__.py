"""MMS flat-file ingestion — the reference's own domain pipeline, Ray-native.

Covers SURVEY.md §2 rows S1-S5, P1-P12, G1-G4 and §2.5 F1-F8: CSV
flat files (optionally inside nested zips) parse into C/I/D records, segment
into header-bound tables, pivot through the static package schemas into typed
Arrow, and route to per-package Parquet — with files as the unit of Ray
parallelism (intra-file order is the G1 contract) and vectorized typed casts
replacing the reference's per-scalar inference loop.
"""

from nem_mms_ray.mms.schemas import PACKAGES, package_for_header  # noqa: F401
from nem_mms_ray.mms.flatfile import parse_flatfile_bytes  # noqa: F401
from nem_mms_ray.mms.pipeline import parse_to_parquet  # noqa: F401
