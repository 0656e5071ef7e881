"""INI config compatibility (reference S7/S8).

Honors the reference's config surface — sections ``KafkaSettings`` /
``MsgSettings`` / ``HTTPEndpointSetting`` with the same keys, defaults,
and side-files (``ssbc_config_base.ini:1-17``; ``CONFIG_TYPES``
main.py:34-53; ``DEFAULT_CONFIG`` main.py:55-74) — with the reference's
config bugs fixed rather than replicated:

- the ``CONFIG_TYPES`` key ``'0'`` that should be ``'clean_interval'``
  (main.py:50) made the intended key unreachable (KeyError at
  main.py:298); here ``clean_interval`` is a first-class int key.
- ``main()`` passing ``sys.argv[1:]`` (a list) as the path (main.py:332)
  is replaced by an explicit path argument.

A user's existing INI file for the reference parses unchanged.
"""

from __future__ import annotations

import configparser
import json
from dataclasses import dataclass, field


DEFAULT_CONFIG: dict[str, dict] = {
    "KafkaSettings": {
        "broker": "localhost:2181",
        "topic": "logstash-test",
        "avro_val_schema": None,
    },
    "MsgSettings": {
        "bucket_interval": 20,
        "bucket_field": None,
        "msg_map_schema": None,
        "bucket_type": "epoch",
    },
    "HTTPEndpointSetting": {
        "sqlite_schema": None,
        "sqlite_db": ":memory:",
        "sqlite_table": "default",
        "clean_interval": 100,
        "clean_freq": 10,
    },
}

CONFIG_TYPES: dict[str, dict[str, type]] = {
    "KafkaSettings": {"broker": str, "topic": str, "avro_val_schema": str},
    "MsgSettings": {
        "bucket_interval": int,
        "bucket_field": str,
        "msg_map_schema": str,
        "bucket_type": str,
    },
    "HTTPEndpointSetting": {
        "sqlite_schema": str,
        "sqlite_db": str,
        "sqlite_table": str,
        "clean_interval": int,  # the reference's intended (broken) key
        "clean_freq": int,
    },
}


@dataclass
class EngineConfig:
    """The reference's 12-tuple (main.py:290-322) as a typed config."""

    broker: str = "localhost:2181"
    topic: str = "logstash-test"
    avro_schema: str | None = None  # Avro schema JSON text (side-file contents)
    bucket_interval: int = 20
    bucket_field: str | None = None
    bucket_type: str = "epoch"
    msg_map: dict[str, str] = field(default_factory=dict)  # {new_key: old_key}
    table_schema: dict[str, str] | None = None  # serving column -> type name
    db_path: str = ":memory:"
    table_name: str = "default"
    clean_interval: int = 100
    clean_freq: int = 10


def read_config_file(path: str, defaults: dict[str, dict] | None = None) -> dict[str, dict]:
    """S7: INI parse overlaying defaults (utils.py:383-394), typed per
    CONFIG_TYPES (empty strings fall back to defaults, matching
    ConfigParser-with-defaults behavior)."""
    merged = {s: dict(kv) for s, kv in (defaults or DEFAULT_CONFIG).items()}
    parser = configparser.ConfigParser()
    with open(path) as fh:
        parser.read_file(fh)
    for section in parser.sections():
        merged.setdefault(section, {})
        for key, raw in parser.items(section):
            if raw == "":
                continue
            cast = CONFIG_TYPES.get(section, {}).get(key, str)
            merged[section][key] = cast(raw)
    return merged


def _load_json_side_file(path: str | None):
    if not path:
        return None
    with open(path) as fh:
        return json.load(fh)


def _read_text(path: str | None) -> str | None:
    if not path:
        return None
    try:
        with open(path) as fh:
            return fh.read()
    except OSError:
        return None


def load_engine_config(path: str) -> EngineConfig:
    """S8: typed config extraction + side-file loading (main.py:290-322)."""
    raw = read_config_file(path)
    kafka, msg, http = (
        raw["KafkaSettings"],
        raw["MsgSettings"],
        raw["HTTPEndpointSetting"],
    )
    return EngineConfig(
        broker=kafka["broker"],
        topic=kafka["topic"],
        avro_schema=_read_text(kafka.get("avro_val_schema")),
        bucket_interval=msg["bucket_interval"],
        bucket_field=msg["bucket_field"],
        bucket_type=msg["bucket_type"],
        msg_map=_load_json_side_file(msg.get("msg_map_schema")) or {},
        table_schema=_load_json_side_file(http.get("sqlite_schema")),
        db_path=http["sqlite_db"],
        table_name=http["sqlite_table"],
        clean_interval=http["clean_interval"],
        clean_freq=http["clean_freq"],
    )
