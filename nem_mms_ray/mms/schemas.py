"""Static package schemas + header dispatch (reference parity).

Field lists and nullability reproduce the reference's six lazy-static Arrow
schemas (/root/reference/src/packages/schema.rs:10-131) — the WHAT; the
representation here is a single registry dict, collapsing the reference's
five hand-maintained dispatch sites (/root/reference/src/packages/mod.rs:
64-112) into one, per its own TODO (reference README.md:170-175).

Timestamps are `timestamp[s]` naive, exactly as the reference's
`Timestamp(Second, None)`.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

_TS = pa.timestamp("s")


def _f(name: str, typ: pa.DataType, nullable: bool) -> pa.field:
    return pa.field(name, typ, nullable=nullable)


DISPATCH_UNIT_SCADA = pa.schema([
    _f("DUID", pa.string(), False),
    _f("SETTLEMENTDATE", _TS, False),
    _f("SCADAVALUE", pa.float64(), True),
])

DISPATCH_NEGATIVE_RESIDUE = pa.schema([
    _f("SETTLEMENTDATE", _TS, False),
    _f("NRM_DATETIME", _TS, False),
    _f("DIRECTIONAL_INTERCONNECTORID", pa.string(), False),
    _f("NRM_ACTIVATED_FLAG", pa.bool_(), True),
    _f("CUMUL_NEGRESIDUE_AMOUNT", pa.float64(), True),
    _f("CUMUL_NEGRESIDUE_PREV_TI", pa.float64(), True),
    _f("NEGRESIDUE_CURRENT_TI", pa.float64(), True),
    _f("NEGRESIDUE_PD_NEXT_TI", pa.float64(), True),
    _f("PRICE_REVISION", pa.string(), True),
    _f("PREDISPATCHSEQNO", pa.string(), True),
    _f("EVENT_ACTIVATED_DI", _TS, True),
    _f("EVENT_DEACTIVATED_DI", _TS, True),
    _f("DI_NOTBINDING_COUNT", pa.int16(), True),
    _f("DI_VIOLATED_COUNT", pa.int16(), True),
    _f("NRM_CONSTRAINT_BLOCKED_FLAG", pa.bool_(), True),
])

DISPATCH_LOCAL_PRICE = pa.schema([
    _f("SETTLEMENTDATE", _TS, False),
    _f("DUID", pa.string(), False),
    _f("LOCAL_PRICE_ADJUSTMENT", pa.float64(), True),
    _f("LOCALLY_CONSTRAINED", pa.int8(), True),
])

ROOFTOP_PV_ACTUAL = pa.schema([
    _f("INTERVAL_DATETIME", _TS, False),
    _f("TYPE", pa.string(), False),
    _f("REGIONID", pa.string(), False),
    _f("POWER", pa.float64(), True),
    _f("QI", pa.float64(), True),
    _f("LASTCHANGED", _TS, True),
])

ROOFTOP_PV_FORECAST = pa.schema([
    _f("VERSION_DATETIME", _TS, False),
    _f("REGIONID", pa.string(), False),
    _f("INTERVAL_DATETIME", _TS, False),
    _f("POWERMEAN", pa.float64(), True),
    _f("POWERPOE50", pa.float64(), True),
    _f("POWERPOELOW", pa.float64(), True),
    _f("POWERPOEHIGH", pa.float64(), True),
    _f("LASTCHANGED", _TS, True),
])

_DISPATCHPRICE_FCAS = []
for side in ("RAISE", "LOWER"):
    for speed in ("6SEC", "60SEC", "5MIN", "REG"):
        _DISPATCHPRICE_FCAS += [
            _f(f"{side}{speed}RRP", pa.float64(), True),
            _f(f"{side}{speed}ROP", pa.float64(), True),
            _f(f"{side}{speed}APCFLAG", pa.int16(), True),
        ]
_PRE_AP = [
    _f(f"{pre}_{tail}_PRICE", pa.float64(), True)
    for pre in ("PRE_AP", "CUMUL_PRE_AP")
    for tail in ("ENERGY", "RAISE6", "RAISE60", "RAISE5MIN", "RAISEREG",
                 "LOWER6", "LOWER60", "LOWER5MIN", "LOWERREG")
]

DISPATCHPRICE = pa.schema(
    [
        _f("SETTLEMENTDATE", _TS, False),
        _f("RUNNO", pa.int16(), False),
        _f("REGIONID", pa.string(), False),
        _f("DISPATCHINTERVAL", pa.string(), False),
        _f("INTERVENTION", pa.int16(), False),
        _f("RRP", pa.float64(), True),
        _f("EEP", pa.float64(), True),
        _f("ROP", pa.float64(), True),
        _f("APCFLAG", pa.int16(), True),
        _f("MARKETSUSPENDEDFLAG", pa.int16(), True),
        _f("LASTCHANGED", _TS, True),
    ]
    + _DISPATCHPRICE_FCAS
    + [_f("PRICE_STATUS", pa.string(), True)]
    + _PRE_AP
    + [_f("OCD_STATUS", pa.string(), True), _f("MII_STATUS", pa.string(), True)]
)


@dataclass(frozen=True)
class PackageDef:
    name: str                      # CLI name (Package::as_str)
    report_type: str               # header dispatch pair
    report_subtype: str            # (/root/reference/src/packages/mod.rs:89-100)
    schema: pa.Schema


PACKAGES: dict[str, PackageDef] = {
    p.name: p
    for p in [
        PackageDef("DISPATCH_UNIT_SCADA", "DISPATCH", "UNIT_SCADA", DISPATCH_UNIT_SCADA),
        PackageDef("DISPATCH_NEGATIVE_RESIDUE", "DISPATCH", "NEGATIVE_RESIDUE", DISPATCH_NEGATIVE_RESIDUE),
        PackageDef("DISPATCH_LOCAL_PRICE", "DISPATCH", "LOCAL_PRICE", DISPATCH_LOCAL_PRICE),
        PackageDef("DISPATCHPRICE", "DISPATCH", "PRICE", DISPATCHPRICE),
        PackageDef("ROOFTOP_PV_ACTUAL", "ROOFTOP", "ACTUAL", ROOFTOP_PV_ACTUAL),
        PackageDef("ROOFTOP_PV_FORECAST", "ROOFTOP", "FORECAST", ROOFTOP_PV_FORECAST),
    ]
}

_BY_HEADER = {(p.report_type, p.report_subtype): p for p in PACKAGES.values()}


def package_for_header(report_type: str, report_subtype: str) -> PackageDef | None:
    """Header-driven schema dispatch; None = unrecognized (skip-and-log,
    /root/reference/src/packages/mod.rs:200-217)."""
    return _BY_HEADER.get((report_type, report_subtype))


def package_info(name: str) -> str:
    """`info` command analog (/root/reference/src/packages/mod.rs:141-194)."""
    p = PACKAGES[name]
    lines = [
        f"Package: {p.name}",
        f"Dispatch: I,{p.report_type},{p.report_subtype},*",
        "Schema:",
    ]
    for f in p.schema:
        lines.append(f"  {f.name}: {f.type}{'' if f.nullable else ' NOT NULL'}")
    return "\n".join(lines)
