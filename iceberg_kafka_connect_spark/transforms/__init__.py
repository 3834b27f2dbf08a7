"""The SMT layer re-expressed as composable DataFrame transforms.

Reference: kafka-connect-transforms module. Each transform is a pure
``DataFrame -> DataFrame`` function, chainable with ``df.transform(...)`` —
the same slot Kafka Connect's Single Message Transform chain occupies, but
plan-time (Catalyst sees through the whole chain and optimizes it as one
projection; nothing is per-record Python).
"""

from .copy_value import copy_value
from .debezium import debezium_transform
from .dms import dms_transform
from .json_to_map import json_to_map
from .kafka_metadata import kafka_metadata
from .mongo import mongo_debezium_transform

__all__ = [
    "copy_value",
    "debezium_transform",
    "dms_transform",
    "json_to_map",
    "kafka_metadata",
    "mongo_debezium_transform",
]
