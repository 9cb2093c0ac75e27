"""Plan-level utilities: skew mitigation (salting), bucketing helpers,
and explain-inspection helpers used by tests and SCALE.md."""

from xml_hive_spark.plans.skew import salted_join  # noqa: F401
