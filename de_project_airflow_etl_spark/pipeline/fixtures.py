"""Deterministic Launch-Library-shaped fixtures (FIXTURES.md §1).

Generates the raw-zone JSON documents the reference downloads from the
Launch Library 2 API (/root/reference/dags/rocket_launch_etl.py:36-48)
— envelope ``{count, next, previous, results: [...]}`` with 2-3 level
nested structs — including the edge cases SURVEY.md §7.4 calls out:
records with null ``image``, null ``image.license``, duplicate ids
within a day, and an empty-results day.
"""

from __future__ import annotations

import json


def launch_record(idx: int, day: str, *, status: str = "Go",
                  image: bool = True, license_: bool = True,
                  dup_of: int | None = None) -> dict:
    rid = dup_of if dup_of is not None else idx
    rec = {
        "id": f"launch-{day}-{rid:04d}",
        "url": f"https://ll.example/api/launches/launch-{day}-{rid:04d}/",
        "name": f"Mission {rid:04d}",
        "slug": f"mission-{rid:04d}",          # extra field: must be tolerated
        "status": {"name": status, "abbrev": status[:2]},
        "net": f"{day}T{(idx * 7) % 24:02d}:{(idx * 13) % 60:02d}:00Z",
        "image": None,
    }
    if image:
        rec["image"] = {
            "image_url": f"https://img.example/{rid:04d}.png",
            "license": {"name": "CC-BY-4.0"} if license_ else None,
        }
    return rec


def launch_day_payload(day: str, n: int) -> dict:
    """One API response document for one day (the raw-zone unit)."""
    results = []
    for i in range(n):
        results.append(launch_record(
            i, day,
            status=("Go", "TBD", "Success")[i % 3],
            image=(i % 4 != 3),          # every 4th record: null image struct
            license_=(i % 3 != 2),       # every 3rd image: null license
        ))
    if n >= 2:  # duplicate id inside the day -> COUNT(DISTINCT) != COUNT(*)
        results.append(launch_record(n, day, dup_of=0))
    return {"count": len(results), "next": None, "previous": None,
            "results": results}


DEFAULT_DAYS = {
    "2024-12-01": 5,
    "2024-12-02": 3,
    "2024-12-03": 0,   # a day with no launches
}


def write_raw_fixture(raw_dir: str, days: dict[str, int] | None = None) -> list[str]:
    """Write one raw JSON document per day, reference layout
    ``raw/launch/{YYYY-MM-DD}.json``. Returns the day keys."""
    import os
    days = days or DEFAULT_DAYS
    os.makedirs(raw_dir, exist_ok=True)
    for day, n in days.items():
        path = os.path.join(raw_dir, f"{day}.json")
        if not os.path.exists(path):  # idempotent put (SURVEY §2.6 O4)
            with open(path, "w") as f:
                json.dump(launch_day_payload(day, n), f)
    return list(days)
