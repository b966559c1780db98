"""NeoWs-shaped fixture documents (FIXTURES.md §B).

Deterministic fixture feed used by BOTH the pytest suite and the
driver-checked ``neows_flatten_silver`` / ``neows_star_join`` queries
(plans/neows_queries.py) — the same two documents, embedded as JSON
literals on the oracle side.

Covers: ≥2 NEOs; one NEO with 2 close approaches (double-explode
fan-out); literal "NULL" and "" placeholders (normalization); the same
asteroid id on two days (dedup + merge keys); a year-boundary
approach_date_full (ISO week edge); distinct hours/minutes.
"""



def _neo(
    neo_id: str,
    name: str,
    magnitude,
    hazardous: bool,
    approaches: list[dict],
    jpl_url: str = "https://ssd.jpl.nasa.gov/tools/sbdb_lookup.html",
):
    return {
        "id": neo_id,
        "neo_reference_id": neo_id,
        "name": name,
        "absolute_magnitude_h": magnitude,
        "is_potentially_hazardous_asteroid": hazardous,
        "is_sentry_object": False,
        "nasa_jpl_url": jpl_url,
        "links": {"self": f"http://api.nasa.gov/neo/rest/v1/neo/{neo_id}"},
        "estimated_diameter": {
            "kilometers": {"estimated_diameter_min": 0.1, "estimated_diameter_max": 0.23},
            "meters": {"estimated_diameter_min": 100.0, "estimated_diameter_max": 230.0},
            "miles": {"estimated_diameter_min": 0.06, "estimated_diameter_max": 0.14},
            "feet": {"estimated_diameter_min": 330.0, "estimated_diameter_max": 755.0},
        },
        "close_approach_data": approaches,
    }


def _approach(date: str, full: str, epoch: int, body: str = "Earth", vel="13.08"):
    return {
        "close_approach_date": date,
        "close_approach_date_full": full,
        "epoch_date_close_approach": epoch,
        "relative_velocity": {
            "kilometers_per_second": vel,
            "kilometers_per_hour": "47087.38",
            "miles_per_hour": "29259.02",
        },
        "miss_distance": {
            "astronomical": "0.0334",
            "lunar": "13.01",
            "kilometers": "5000612.5",
            "miles": "3107265.8",
        },
        "orbiting_body": body,
    }


DAY1 = "2025-12-28"
DAY2 = "2025-12-31"

DOC_DAY1 = {
    "near_earth_objects": {
        DAY1: [
            _neo(
                "3542519",
                "(2010 PK9)",
                21.87,
                True,
                [
                    _approach(DAY1, "2025-Dec-28 05:12", 1766898720000),
                    _approach(DAY1, "2025-Dec-28 18:45", 1766947500000, body="Moon"),
                ],
            ),
            _neo(
                "2099942",
                "99942 Apophis",
                19.7,
                True,
                [_approach(DAY1, "2025-Dec-28 11:30", 1766921400000)],
                jpl_url="NULL",  # placeholder -> null after normalization
            ),
        ]
    }
}

DOC_DAY2 = {
    "near_earth_objects": {
        DAY2: [
            # same asteroid id as day 1, later observation (dedup target)
            _neo(
                "3542519",
                "(2010 PK9)",
                21.90,
                True,
                [_approach(DAY2, "2025-Dec-31 23:59", 1767225540000, vel="14.01")],
            ),
            _neo(
                "54016476",
                "",  # empty-string placeholder -> null
                26.1,
                False,
                [_approach(DAY2, "2025-Dec-31 00:01", 1767139260000)],
            ),
        ]
    }
}
