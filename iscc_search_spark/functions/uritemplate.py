"""F8 — IDP gateway URI-template expansion.

Mirrors the reference's expand_gateway semantics
(iscc_search/aggregator/entry.py:25-51): {iscc_id} / {iscc_code}
substitute the lowercase prefix-less base32 body (no "ISCC:"),
{datahash} the lowercase hex multihash; the schema-admitted operator
forms {/var} and {.var} expand to "/value" and ".value"; a plain URL
passes through unchanged.

JVM-side implementation: a chain of literal F.replace calls — pure
whole-stage codegen, no UDF (edge-metadata work must not cost a Python
round-trip when run over 10^12 declaration log rows)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_VARS = ("iscc_id", "iscc_code", "datahash")


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def expand_gateway_expr(template, iscc_id, iscc_code, datahash) -> Column:
    """Expand the template column using the three value columns."""
    vals = {
        "iscc_id": F.lower(F.regexp_replace(_col(iscc_id), "^ISCC:", "")),
        "iscc_code": F.lower(F.regexp_replace(_col(iscc_code), "^ISCC:", "")),
        "datahash": _col(datahash),  # input contract: already lowercase hex
    }
    out = _col(template)
    for var in _VARS:
        v = vals[var]
        out = F.replace(out, F.lit("{" + var + "}"), v)
        out = F.replace(out, F.lit("{/" + var + "}"), F.concat(F.lit("/"), v))
        out = F.replace(out, F.lit("{." + var + "}"), F.concat(F.lit("."), v))
    return out


def expand_gateway_py(
    template: str, iscc_id: str, iscc_code: str, datahash: str
) -> str:
    """Single-node twin (oracle parity)."""
    values = {
        "iscc_id": iscc_id.removeprefix("ISCC:").lower(),
        "iscc_code": iscc_code.removeprefix("ISCC:").lower(),
        "datahash": datahash,  # input contract: already lowercase hex
    }
    for var, value in values.items():
        template = template.replace("{" + var + "}", value)
        template = template.replace("{/" + var + "}", "/" + value)
        template = template.replace("{." + var + "}", "." + value)
    return template
