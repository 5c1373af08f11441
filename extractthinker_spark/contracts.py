"""Contract + classification registries (the broadcast dimension).

Mirrors the reference's Classification registry shape
(/root/reference/extract_thinker/models/classification.py:6-17) and the
user-defined Pydantic contracts (tests/models/*.py), with the LLM
judgment replaced by deterministic keyword / field-pattern rules
(BASELINE.json north_star). The registry is small by construction —
it is always broadcast, never shuffled.

Scoring spec (versioned; corpus goldens derive from it):
    hits        = number of distinct class patterns matching the text
    confidence  = 1 if hits == 0 else min(10, 2*hits + 2)   # 1..10
    winner      = argmax by (confidence, then name ascending)
    zero hits everywhere → ("Unknown", 1)  — the reference's fallback
    (extractor.py:609-720 uses Unknown/1 when no class matches).
"""

from __future__ import annotations

# (?i) inline flags — Spark rlike and Python re both honor them.
CLASS_RULES: list[tuple[str, list[str]]] = [
    ("Invoice", [r"(?i)invoice\s*#", r"(?i)total:", r"(?i)date:", r"=\s*\d"]),
    ("Driver License", [r"(?i)driver license", r"(?i)license no",
                        r"(?i)\bage:", r"(?i)\bname:"]),
    ("Vehicle Registration", [r"(?i)vehicle registration", r"(?i)name primary",
                              r"(?i)vehicle (type|color)", r"(?i)plate:"]),
    ("Credit Note", [r"(?i)credit note", r"(?i)credit amount",
                     r"(?i)reference invoice", r"(?i)total:"]),
    ("Budget", [r"(?i)\bincome\b", r"(?i)\bexpense\b", r"(?i)cash flow", r"\|"]),
    ("GDP Report", [r"(?i)\bgdp\b", r"(?i)per capita", r"(?i)country:",
                    r"(?i)province"]),
]

UNKNOWN = "Unknown"

# Field-extraction regexes per contract (group 1 = value). The
# deterministic stand-in for the reference's LLM contract extraction
# (extractor.py:193-335); shapes mirror tests/models/invoice.py,
# driver_license.py, gdp_contract.py.
CONTRACT_FIELDS: dict[str, dict[str, str]] = {
    "Invoice": {
        "invoice_number": r"Invoice #(\d+)",
        "invoice_date": r"Date: ([0-9/]+)",
        "total_amount": r"Total: ([0-9.]+)",
    },
    "Driver License": {
        "name": r"Name: ([^\n]+)",
        "age": r"Age: (\d+)",
        "license_number": r"License No: (\d+)",
    },
    "Vehicle Registration": {
        "name_primary": r"Name Primary: ([^\n]+)",
        "vehicle_type": r"Vehicle Type: ([^\n]+)",
        "vehicle_color": r"Vehicle Color: ([^\n]+)",
        "plate": r"Plate: ([^\n]+)",
    },
    "Budget": {
        "income": r"Income \| (\d+)",
        "expense": r"Expense \| (\d+)",
        "cash_flow": r"Cash Flow \| (-?\d+)",
    },
}

# List-valued contract fields extracted with regexp_extract_all then
# indexed (GDP countries — pagination-merge fixture).
CONTRACT_LIST_FIELDS: dict[str, dict[str, str]] = {
    "GDP Report": {
        "country": r"Country: ([A-Za-z ]+?) Province",
    },
}


def confidence_from_hits(hits: int) -> int:
    return 1 if hits <= 0 else min(10, 2 * hits + 2)
