"""English-language rule compiler + validators (SURVEY §2 T4, A7).

The reference compiles one-line English rules (``FIELD: sentence``) into
typed validators (/root/reference/microservices/rule-engine-service/
validation_engine.py:266-387), caches compiled rules by file mtime
(:416-474) and reports per-rule results + summary (:487-525). Rebuilt here
as: rules parsed **once on the driver**, shipped as plain data in the UDF
closure (broadcast-small-side, SURVEY §2.5 J3); validators are pure
functions over the flat entity columns.

Supported rule grammar (regex-parsed, case-insensitive):

- ``must match pattern <REGEX>``
- ``must be a valid date in DD.MM.YYYY format`` / ``in YYMMDD format``
  (validation_engine.py:132-158 date parsing)
- ``must not be empty``
- ``must be a number greater than <N>`` / ``less than <N>``
  (numeric parse strips thousands separators, validation_engine.py:64)
- ``must contain <TEXT>``
- ``must be a valid ISO 4217 currency amount greater than <N>``
  (``^[A-Z]{3}\\s*[\\d,.]+$`` check, validation_engine.py:161-176)
- ``must be <VALUE>`` exact (upper-cased compare, :97-98)
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass
from typing import Callable

import pyarrow as pa

from documentai_ray.functions.text import try_parse_number

_CCY_AMOUNT_RE = re.compile(r"^[A-Z]{3}\s*[\d,.]+$")


@dataclass(frozen=True)
class Rule:
    field: str
    rule_type: str
    text: str
    check: Callable[[str], bool]
    # cross-field rules (validation_engine.py:225-255 date comparisons)
    # get the whole entity dict as second argument
    cross_check: Callable[[str, dict], bool] | None = None


def _parse_date(value: str, fmt: str) -> bool:
    try:
        _dt.datetime.strptime(value, fmt)
        return True
    except ValueError:
        return False


_DATE_FORMATS = ("%d.%m.%Y", "%y%m%d", "%d/%m/%Y", "%Y-%m-%d")


def _parse_any_date(value: str):
    for fmt in _DATE_FORMATS:
        try:
            return _dt.datetime.strptime(value, fmt)
        except ValueError:
            continue
    return None


def compile_rule(field: str, sentence: str) -> Rule:
    s = sentence.strip()
    low = s.lower()
    # cross-field date comparison (validation_engine.py:225-255):
    # "... must be a date on or after the value of OTHER_FIELD"
    m = re.search(r"must be a date (on or after|after|before) the value of (\w+)", low)
    if m:
        op, other = m.group(1), m.group(2).upper()

        def cross(value: str, entities: dict, op=op, other=other) -> bool:
            d1 = _parse_any_date(value or "")
            d2 = _parse_any_date(
                entities.get(other.lower(), entities.get(other, "")) or "")
            if d1 is None or d2 is None:
                return False
            if op == "after":
                return d1 > d2
            if op == "before":
                return d1 < d2
            return d1 >= d2

        return Rule(field, "cross_date", s, lambda v: True, cross)
    m = re.search(r"must match pattern (\S+)", s, re.I)
    if m:
        rx = re.compile(m.group(1))
        return Rule(field, "pattern", s, lambda v, rx=rx: bool(v) and bool(rx.fullmatch(v)))
    if re.search(r"must be a valid date in dd\.mm\.yyyy format", low):
        return Rule(field, "date", s, lambda v: bool(v) and _parse_date(v, "%d.%m.%Y"))
    if re.search(r"in yymmdd format", low):
        return Rule(field, "date", s, lambda v: bool(v) and _parse_date(v, "%y%m%d"))
    if re.search(r"must not be empty", low):
        return Rule(field, "required", s, lambda v: bool(v and v.strip()))
    m = re.search(r"must be a valid iso 4217 currency amount(?: greater than ([\d,.]+))?", low)
    if m:
        floor = float(m.group(1).replace(",", "")) if m.group(1) else None
        def ccy(v: str, floor=floor) -> bool:
            if not v or not _CCY_AMOUNT_RE.match(v.strip()):
                return False
            num = try_parse_number(v.strip()[3:])
            return num is not None and (floor is None or num > floor)
        return Rule(field, "currency_amount", s, ccy)
    m = re.search(r"must be a number greater than ([\d,.]+)", low)
    if m:
        t = float(m.group(1).replace(",", ""))
        return Rule(field, "number_gt", s,
                    lambda v, t=t: (n := try_parse_number(v)) is not None and n > t)
    m = re.search(r"must be a number less than ([\d,.]+)", low)
    if m:
        t = float(m.group(1).replace(",", ""))
        return Rule(field, "number_lt", s,
                    lambda v, t=t: (n := try_parse_number(v)) is not None and n < t)
    m = re.search(r"must contain (.+)$", s, re.I)
    if m:
        needle = m.group(1).strip()
        return Rule(field, "contains", s, lambda v, nd=needle: bool(v) and nd in v)
    m = re.search(r"must be (.+)$", s, re.I)
    if m:
        want = m.group(1).strip().upper()
        return Rule(field, "equals", s, lambda v, w=want: bool(v) and v.strip().upper() == w)
    # unknown rule sentences pass (reference logs + skips unparseable rules)
    return Rule(field, "unknown", s, lambda v: True)


def load_rules(path: str) -> list[Rule]:
    """Parse a ``FIELD: sentence`` rule file (driver-side, once)."""
    rules: list[Rule] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            field, _, sentence = line.partition(":")
            if sentence:
                rules.append(compile_rule(field.strip(), sentence.strip()))
    return rules


def validate_entities(entities: dict[str, str], rules: list[Rule]) -> dict:
    """Per-document rule run → result records + summary
    (validation_engine.py:487-525 shape)."""
    results = []
    passed = 0
    for r in rules:
        value = entities.get(r.field.lower(), entities.get(r.field, ""))
        if r.cross_check is not None:
            ok = bool(r.cross_check(value, entities))
        else:
            ok = bool(r.check(value))
        passed += ok
        results.append({"field": r.field, "rule_type": r.rule_type, "passed": ok})
    return {
        "results": results,
        "rules_passed": passed,
        "rules_failed": len(rules) - passed,
        "overall_valid": passed == len(rules),
    }


class RulesStage:
    """map_batches callable: compiled rules held per worker; applies only to
    rows whose ``category`` has a rule file (others pass trivially with 0
    rules — mirroring the reference's per-doc-type rule lookup)."""

    def __init__(self, rules_by_category: dict[str, list[Rule]]):
        self.rules_by_category = rules_by_category
        # only the columns rules actually reference leave Arrow — never the
        # (large) text column
        self.needed_fields = {
            r.field.lower()
            for rules in rules_by_category.values()
            for r in rules
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        cats = batch.column("category").to_pylist()
        n = batch.num_rows
        field_cols = {
            name: batch.column(name).to_pylist()
            for name in batch.column_names
            if name in self.needed_fields
            and batch.schema.field(name).type == pa.string()
        }
        passed, failed, valid = [], [], []
        for i in range(n):
            rules = self.rules_by_category.get(cats[i], [])
            ents = {name: (field_cols[name][i] or "") for name in field_cols}
            res = validate_entities(ents, rules)
            passed.append(res["rules_passed"])
            failed.append(res["rules_failed"])
            valid.append(res["overall_valid"])
        out = batch.append_column("rules_passed", pa.array(passed, pa.int64()))
        out = out.append_column("rules_failed", pa.array(failed, pa.int64()))
        return out.append_column("overall_valid", pa.array(valid, pa.bool_()))
