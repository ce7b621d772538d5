"""tsmp_ray — Ray-Data-native time-series rollup + matrix-profile engine.

From-scratch re-implementation (NOT a port) of the query/data-processing
capabilities of matrix-profile-foundation/tsmp, rehosted as a streaming Ray
Data pipeline over Parquet conversation transcripts. See SURVEY.md.
"""

from .config import DEFAULT_EZ, EPS, SIGNALS, TIERS, EngineConfig, exclusion_zone

__version__ = "0.1.0"

__all__ = ["DEFAULT_EZ", "EPS", "SIGNALS", "TIERS", "EngineConfig",
           "exclusion_zone", "__version__"]
