"""Persisted application settings.

Reference: typed Settings struct serialized via JST_SERDES to platform
storage (/root/reference/include/jetstream/settings.hh:12-95,
src/settings.cc; storage in src/platform/storage.cc).  Here: a Schema-
typed tree persisted as YAML under the XDG config dir.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional

import yaml

from cyberether_tpu.core.params import Field, Schema

SCHEMA = Schema(
    Field("graphicsBackend", "str", "headless"),
    Field("remoteEnabled", "bool", False),
    Field("remotePort", "int", 8765),
    Field("interfaceScale", "float", 1.0),
    Field("developerTimingEnabled", "bool", False),
    Field("developerLatencyEnabled", "bool", False),
    Field("benchmarkFormat", "str", "markdown"),
    Field("pluginPaths", "list[str]", []),
    Field("logLevel", "str", "WARNING"),
)


def config_dir() -> str:
    base = os.environ.get("XDG_CONFIG_HOME",
                          os.path.expanduser("~/.config"))
    return os.path.join(base, "cyberether_tpu")


def settings_path() -> str:
    return os.path.join(config_dir(), "settings.yaml")


class Settings:
    _instance: Optional["Settings"] = None
    _lock = threading.Lock()

    def __init__(self, path: Optional[str] = None):
        self.path = path or settings_path()
        self._values: Dict[str, Any] = SCHEMA.decode({})
        self.load()

    @classmethod
    def get(cls) -> "Settings":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def load(self) -> None:
        if os.path.exists(self.path):
            try:
                with open(self.path) as f:
                    raw = yaml.safe_load(f) or {}
                self._values = SCHEMA.decode(raw)
            except Exception:
                self._values = SCHEMA.decode({})

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "w") as f:
            yaml.safe_dump(SCHEMA.encode(self._values), f,
                           sort_keys=False)

    def __getitem__(self, key: str) -> Any:
        return self._values[key]

    def set(self, key: str, value: Any, persist: bool = True) -> None:
        if key in SCHEMA.fields:
            value = SCHEMA.fields[key].coerce(value)
        self._values[key] = value
        if persist:
            self.save()

    def as_dict(self) -> Dict[str, Any]:
        return dict(self._values)
