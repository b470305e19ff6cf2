from open_thoughts_spark.rules.heuristics import with_quality_flags, with_decision
from open_thoughts_spark.rules.scrub import with_scrubbed_text

__all__ = ["with_quality_flags", "with_decision", "with_scrubbed_text"]
