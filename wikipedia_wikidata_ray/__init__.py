"""wikipedia_wikidata_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch re-expression of the query/data-processing capabilities of
osm-search/wikipedia-wikidata (the Nominatim "wikimedia importance" ETL,
reference at /root/reference) as idiomatic ray.data.Dataset pipelines,
extended per the north rule (BASELINE.json) with the geospatial operators a
Common-Crawl-scale web-page workload needs: hierarchical cell encoding
(S2 + hex), STRtree-backed point-in-polygon joins, kNN place matching,
raster/vector tile assignment, hot-cell salting, and the training-data
toolkit (dedup, similarity search, text analysis).

Design rules (see SURVEY.md):
- every stage is a ``Dataset`` transform over zero-copy Arrow batches;
- stateful stages (spatial indexes, broadcast lookups) are actor pools;
- wide steps are ``groupby``/``sort`` shuffles with explicit pre-aggregation
  and salting of hot keys;
- no stage calls ``ray.init``/``ray.shutdown`` — sessions are owned by the
  caller (bench.py, CLI, test fixture).
"""

__version__ = "0.1.0"

# Engine-wide Ray Data context tuning (polars sort path). Import-time is the
# one hook every entry point (driver-imported __ray_entry__, bench.py,
# tests) shares; idempotent and Ray-init-free.
from .config import tune_data_context as _tune  # noqa: E402

_tune()
del _tune
