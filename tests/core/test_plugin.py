"""Plugin loader tests (reference tests/core/extensions/plugins.cc)."""

import os

import numpy as np
import pytest

from cyberether_tpu.core import plugin
from cyberether_tpu.core.registry import registry

BLUEPRINT = os.path.join(os.path.dirname(__file__), "..", "..",
                         "examples", "plugins", "blueprint")


@pytest.fixture(autouse=True)
def _cleanup():
    yield
    for info in list(plugin.list_loaded()):
        try:
            plugin.unload(info.name)
        except Exception:
            pass


def test_load_directory_plugin():
    info = plugin.load(BLUEPRINT)
    assert info.name == "blueprint"
    assert registry.has_block("gain")
    assert "blueprint:gain-demo" in registry.list_examples()
    # the plugin block actually computes
    from cyberether_tpu.testing import TestContext

    x = np.ones(16, np.float32)
    out = TestContext("gain", {"gain": 2.5}).set_input("buffer", x) \
        .run().output("buffer")
    np.testing.assert_allclose(out, 2.5 * x)


def test_unload_removes_registrations():
    plugin.load(BLUEPRINT)
    assert registry.has_block("gain")
    plugin.unload("blueprint")
    assert not registry.has_block("gain")
    assert "blueprint:gain-demo" not in registry.list_examples()


def test_reload():
    plugin.load(BLUEPRINT)
    info = plugin.reload("blueprint")
    assert info.name == "blueprint"
    assert registry.has_block("gain")


def test_pack_and_load_cep(tmp_path):
    bundle = str(tmp_path / "blueprint.cep")
    plugin.pack(BLUEPRINT, bundle)
    assert os.path.exists(bundle)
    info = plugin.load(bundle)
    assert info.name == "blueprint"
    assert registry.has_block("gain")


def test_double_load_rejected():
    plugin.load(BLUEPRINT)
    with pytest.raises(plugin.PluginError):
        plugin.load(BLUEPRINT)


def test_bad_abi_rejected(tmp_path):
    pdir = tmp_path / "bad"
    pdir.mkdir()
    (pdir / "manifest.yml").write_text(
        "name: bad\nabi: 999\nentry: plugin.py\n")
    (pdir / "plugin.py").write_text("")
    with pytest.raises(plugin.PluginError):
        plugin.load(str(pdir))


def test_broken_entry_rolls_back(tmp_path):
    pdir = tmp_path / "broken"
    pdir.mkdir()
    (pdir / "manifest.yml").write_text(
        "name: broken\nabi: 1\nentry: plugin.py\n")
    (pdir / "plugin.py").write_text(
        "from cyberether_tpu.core.registry import register_block\n"
        "from cyberether_tpu.core.block import simple_block\n"
        "register_block(simple_block('half_registered'))\n"
        "raise RuntimeError('boom')\n")
    with pytest.raises(plugin.PluginError):
        plugin.load(str(pdir))
    assert not registry.has_block("half_registered")


@pytest.mark.parametrize("payload", [
    b"",                          # empty file
    b"not a zip at all",          # garbage bytes
    b"PK\x03\x04truncated",       # zip magic, truncated
])
def test_malformed_cep_rejected_cleanly(tmp_path, payload):
    """Hostile/corrupt .cep bundles must fail with PluginError, never
    an unhandled zipfile/OS exception (the loader runs on
    user-supplied files via --plugin and the editor)."""
    from cyberether_tpu.core.plugin import PluginError, load

    p = tmp_path / "evil.cep"
    p.write_bytes(payload)
    with pytest.raises(PluginError):
        load(str(p))


def test_cep_without_manifest_rejected(tmp_path):
    import zipfile

    from cyberether_tpu.core.plugin import PluginError, load

    p = tmp_path / "nomanifest.cep"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("readme.txt", "hello")
    with pytest.raises(PluginError):
        load(str(p))
