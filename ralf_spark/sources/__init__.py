from ralf_spark.sources.synthetic import counter_source, fake_events
from ralf_spark.sources.fixtures import load_fixture, FIXTURE_TABLES

__all__ = ["counter_source", "fake_events", "load_fixture", "FIXTURE_TABLES"]
