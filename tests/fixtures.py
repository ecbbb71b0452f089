"""In-test generators for the FIXTURES.md §A ingestion fixture files."""

from __future__ import annotations

import json
from pathlib import Path


def write_json(path: Path, records) -> Path:
    path.write_text(json.dumps(records, ensure_ascii=False))
    return path


def products_basic(n: int = 250) -> list[dict]:
    """n valid records, unique zero-padded codes (leading zeros matter)."""
    return [
        {
            "code": f"{i:013d}",
            "product_name": f"Product {i}",
            "brands": f"Brand{i % 7}",
            "nutriments": {"fat_100g": round(i * 0.1, 2), "salt_100g": i % 3},
            "categories_tags": [f"en:cat{i % 5}"],
            "serving_quantity": i % 40,
        }
        for i in range(n)
    ]


def products_missing_code() -> list[dict]:
    recs = [{"code": f"mc{i}", "product_name": f"ok {i}"} for i in range(7)]
    recs.append({"product_name": "no code at all"})
    recs.append({"product_name": "null-ish", "brands": "X"})  # also no code
    recs.append({"code": 1234567, "product_name": "numeric code"})
    return recs


def products_update() -> list[dict]:
    """Overlaps products_basic codes; field-survival + null-overwrite cases."""
    return [
        # new values for existing fields
        {"code": f"{0:013d}", "product_name": "Renamed 0", "brands": "NewBrand"},
        # omits brands/nutriments → old ones must survive
        {"code": f"{1:013d}", "product_name": "Renamed 1", "extra_new": "added"},
        # explicit null product_name → spine overwrite with null
        {"code": f"{2:013d}", "product_name": None, "brands": "KeptBrand"},
        # no product_name key at all → dump still carries None → overwrites
        {"code": f"{3:013d}", "brands": "B3"},
        {"code": f"{4:013d}", "product_name": "Renamed 4"},
    ]


def products_dup_within_file() -> list[dict]:
    return [
        {"code": "DUPCODE", "product_name": "first", "brands": "A"},
        {"code": "DUPCODE", "product_name": "second", "brands": "B"},
        {"code": "DUPCODE", "product_name": "third", "brands": "C"},
    ]


def products_external_ids() -> list[dict]:
    return [
        {"code": "EXT1", "product_name": "carries ids", "id": "ext-1", "_id": "ext-2", "brands": "K"},
    ]


def products_unicode_names() -> list[dict]:
    return [
        {"code": "U1", "product_name": "Café au lait"},
        {"code": "U2", "product_name": "CAFÉ AU LAIT"},
        {"code": "U3", "product_name": "100% (Bio)"},
        {"code": "U4", "product_name": "plain coffee"},
        {"code": "U5", "product_name": "café noir"},
    ]
