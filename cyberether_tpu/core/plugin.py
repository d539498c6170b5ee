"""Plugin loader — the .cep analog.

Reference: ``.cep`` bundles (zip: manifest + per-target shared libs +
example flowgraphs) with ABI magic check, registrations drained into the
Registry, and reload with unregister
(/root/reference/src/plugin.cc, include/jetstream/plugin.hh:12-87).

TPU-native plugin format — a ``.cep`` zip or plain directory holding:

    manifest.yml       name / version / abi / entry / examples
    <entry>.py | pkg/  python code registering blocks/modules
    flowgraphs/*.yml   example flowgraphs (registered as examples)
    native/…           optional C/C++ sources or prebuilt .so the
                       plugin's own code may load

ABI compatibility is the framework major version; registrations are
tagged with the plugin name so ``reload``/``unload`` can drain them
(registry.unregister_origin).
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import sys
import tempfile
import zipfile
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

from cyberether_tpu.core.registry import registry
from cyberether_tpu.core.types import FrameworkError
from cyberether_tpu.utils.logging import get_logger

log = get_logger("plugin")

ABI_VERSION = 1


class PluginError(FrameworkError):
    pass


@dataclass
class PluginInfo:
    name: str
    version: str
    abi: int
    path: str
    entry: str
    examples: List[str] = field(default_factory=list)


_loaded: Dict[str, PluginInfo] = {}


def load(path: str) -> PluginInfo:
    """Load a plugin bundle (.cep zip or directory)."""
    root = _materialize(path)
    manifest_path = os.path.join(root, "manifest.yml")
    if not os.path.exists(manifest_path):
        manifest_path = os.path.join(root, "manifest.yaml")
    if not os.path.exists(manifest_path):
        raise PluginError(f"plugin '{path}' has no manifest.yml")
    with open(manifest_path) as f:
        manifest = yaml.safe_load(f) or {}
    name = str(manifest.get("name") or "")
    if not name:
        raise PluginError("plugin manifest must declare a name")
    if name in _loaded:
        raise PluginError(f"plugin '{name}' already loaded")
    abi = int(manifest.get("abi", -1))
    if abi != ABI_VERSION:
        raise PluginError(
            f"plugin '{name}' targets ABI {abi}, framework is "
            f"{ABI_VERSION}")
    entry = str(manifest.get("entry", "plugin.py"))
    entry_path = os.path.join(root, entry)
    if not os.path.exists(entry_path):
        raise PluginError(f"plugin entry '{entry}' missing")

    info = PluginInfo(name=name,
                      version=str(manifest.get("version", "0")),
                      abi=abi, path=root, entry=entry)

    with registry.origin(name):
        _import_entry(name, entry_path)
        fg_dir = os.path.join(root, "flowgraphs")
        if os.path.isdir(fg_dir):
            for fn in sorted(os.listdir(fg_dir)):
                if fn.endswith((".yml", ".yaml")):
                    ex_name = f"{name}:{os.path.splitext(fn)[0]}"
                    with open(os.path.join(fg_dir, fn)) as f:
                        registry.register_example(ex_name, ex_name,
                                                  f.read())
                    info.examples.append(ex_name)

    _loaded[name] = info
    log.info("loaded plugin '%s' v%s", name, info.version)
    return info


def unload(name: str) -> None:
    if name not in _loaded:
        raise PluginError(f"plugin '{name}' is not loaded")
    removed = registry.unregister_origin(name)
    info = _loaded.pop(name)
    sys.modules.pop(f"cyberether_plugin_{name}", None)
    log.info("unloaded plugin '%s' (%d registrations)", name, removed)


def reload(name: str) -> PluginInfo:
    if name not in _loaded:
        raise PluginError(f"plugin '{name}' is not loaded")
    path = _loaded[name].path
    unload(name)
    return load(path)


def list_loaded() -> List[PluginInfo]:
    return list(_loaded.values())


def load_entry_points() -> List[str]:
    """Load plugins installed as python entry points in the
    ``cyberether_tpu.plugins`` group (the pip-installable route)."""
    from importlib.metadata import entry_points

    names: List[str] = []
    try:
        eps = entry_points(group="cyberether_tpu.plugins")
    except TypeError:  # pragma: no cover - older API
        eps = entry_points().get("cyberether_tpu.plugins", [])
    for ep in eps:
        with registry.origin(f"ep:{ep.name}"):
            register = ep.load()
            if callable(register):
                register()
        names.append(ep.name)
    return names


# ---------------------------------------------------------------------------
def _materialize(path: str) -> str:
    """Extract zip bundles to a cache dir; directories load in place."""
    if os.path.isdir(path):
        return os.path.abspath(path)
    if not zipfile.is_zipfile(path):
        raise PluginError(f"'{path}' is not a plugin bundle")
    cache = os.path.join(tempfile.gettempdir(), "cyberether_plugins",
                         os.path.splitext(os.path.basename(path))[0])
    if os.path.exists(cache):
        shutil.rmtree(cache)
    os.makedirs(cache, exist_ok=True)
    with zipfile.ZipFile(path) as z:
        for member in z.namelist():
            target = os.path.realpath(os.path.join(cache, member))
            if not target.startswith(os.path.realpath(cache) + os.sep) \
                    and target != os.path.realpath(cache):
                raise PluginError(
                    f"plugin member escapes bundle: '{member}'")
        z.extractall(cache)
    return cache


def _import_entry(name: str, entry_path: str) -> None:
    mod_name = f"cyberether_plugin_{name}"
    spec = importlib.util.spec_from_file_location(mod_name, entry_path)
    if spec is None or spec.loader is None:
        raise PluginError(f"cannot import plugin entry '{entry_path}'")
    module = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = module
    try:
        spec.loader.exec_module(module)
    except Exception as e:
        sys.modules.pop(mod_name, None)
        registry.unregister_origin(name)
        raise PluginError(f"plugin '{name}' failed to load: {e}")


def pack(src_dir: str, out_path: str) -> str:
    """Create a .cep bundle from a plugin directory (the reference's
    tools/ packer, examples/plugins/blueprint)."""
    if not os.path.isdir(src_dir):
        raise PluginError(f"'{src_dir}' is not a directory")
    if not (os.path.exists(os.path.join(src_dir, "manifest.yml"))
            or os.path.exists(os.path.join(src_dir, "manifest.yaml"))):
        raise PluginError("plugin directory has no manifest.yml")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for base, _dirs, files in os.walk(src_dir):
            for fn in files:
                full = os.path.join(base, fn)
                z.write(full, os.path.relpath(full, src_dir))
    return out_path
