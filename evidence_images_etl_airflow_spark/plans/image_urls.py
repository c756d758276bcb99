"""EP2 / M1 — the ``image_urls`` join view (SURVEY.md §3 EP2).

The reference's single richest relational statement
(add_image_data.py:32-52): evidence_images INNER JOIN sessions on
sessionuid, filtered to complete sessions, projecting a computed date,
session descriptors, and the first element of each formatted array.

Spark shape: one lazy plan — Catalyst pushes ``sessionstatus =
'Complete'`` below the join, prunes both scans to the 12 needed
columns, and (sessions being the smaller curated side in practice)
picks a broadcast-hash join under AQE. No view materialization, no
cursor fetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def image_urls(evidence_images: DataFrame, sessions: DataFrame) -> DataFrame:
    """Build the image_urls view (add_image_data.py:32-52):
    join J1 + filter P3 + projections T6 (to_date) / T7 (element_at).
    Output schema per FIXTURES.md §5."""
    e = evidence_images.alias("e")
    s = sessions.alias("s")
    return (
        s.filter(F.col("s.sessionstatus") == "Complete")  # P3 (:50)
        .join(e, F.col("e.sessionuid") == F.col("s.sessionuid"), "inner")  # J1 (:47-49)
        .select(
            F.to_date(F.col("s.session_start_date")).alias("session_date"),  # T6 (:35)
            F.col("s.client_code").alias("client_code"),
            F.col("s.outlet_code").alias("outlet_code"),
            F.col("s.outlet_name").alias("outlet_name"),
            F.col("s.country_code").alias("country_code"),
            F.col("s.user_id").alias("user_id"),
            F.col("e.sessionuid").alias("sessionuid"),
            F.col("e.sceneuid").alias("sceneuid"),
            F.col("e.scenetype").alias("scenetype"),
            F.col("e.subscenetype").alias("subscenetype"),
            F.element_at(F.col("e.formattedevidenceimagename"), 1).alias("first_image_name"),  # T7 (:45)
            F.element_at(F.col("e.formattedevidenceimageurl"), 1).alias("first_image_url"),  # T7 (:46)
        )
    )
