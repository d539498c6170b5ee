// Superluminal C++ embed implementation — see superluminal.hh.
// Reference cognate: src/superluminal/base.cc (the C++ singleton); here
// the singleton IS the Python package, driven via the CPython C API.

#include "superluminal.hh"

#include <Python.h>

#include <cstdio>
#include <cstdlib>
#include <mutex>

namespace superluminal {
namespace {

std::mutex g_mu;
bool g_inited = false;
PyObject* g_mod = nullptr;       // cyberether_tpu.superluminal
PyObject* g_np = nullptr;        // numpy

void set_err(std::string* err, const char* fallback) {
    if (!err) {
        PyErr_Print();
        return;
    }
    PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
    PyErr_Fetch(&type, &value, &tb);
    if (value) {
        PyObject* s = PyObject_Str(value);
        if (s) {
            const char* c = PyUnicode_AsUTF8(s);
            *err = c ? c : fallback;
            Py_DECREF(s);
        } else {
            *err = fallback;
        }
    } else {
        *err = fallback;
    }
    Py_XDECREF(type);
    Py_XDECREF(value);
    Py_XDECREF(tb);
}

// Call a no-arg (or kwarg-only) function on the package.
bool call0(const char* name, std::string* err,
           PyObject* kwargs = nullptr) {
    PyObject* fn = PyObject_GetAttrString(g_mod, name);
    if (!fn) {
        set_err(err, name);
        return false;
    }
    PyObject* args = PyTuple_New(0);
    PyObject* r = PyObject_Call(fn, args, kwargs);
    Py_DECREF(args);
    Py_DECREF(fn);
    if (!r) {
        set_err(err, name);
        return false;
    }
    Py_DECREF(r);
    return true;
}

}  // namespace

bool initialize(std::string* err) {
    std::lock_guard<std::mutex> lk(g_mu);
    if (g_inited) return true;
    // Force the CPU backend BEFORE the interpreter starts: site
    // customization hooks may register accelerator PJRT plugins at
    // Py_Initialize time, and an embedded plotting session must never
    // contend for a TPU claim.  Must be setenv (not Python-side
    // setdefault — the ambient env typically already sets these).
    // CYBERETHER_EMBED_PLATFORM overrides for accelerator use.
    if (!Py_IsInitialized()) {
        const char* plat = std::getenv("CYBERETHER_EMBED_PLATFORM");
        setenv("JAX_PLATFORMS", plat ? plat : "cpu", 1);
        if (!plat) setenv("PALLAS_AXON_POOL_IPS", "", 1);
        Py_InitializeEx(0);
    }
    PyGILState_STATE gil = PyGILState_Ensure();
    PyRun_SimpleString(
        "import os\n"
        "os.environ.setdefault('JAX_PLATFORMS', 'cpu')\n"
        "os.environ.setdefault('PALLAS_AXON_POOL_IPS', '')\n"
        // the embedded interpreter starts from the base prefix; adopt
        // the PATH python's sys.path (venv site-packages) and the
        // working tree so the package resolves in dev checkouts too
        "try:\n"
        "    import cyberether_tpu  # noqa\n"
        "except ImportError:\n"
        "    import json, subprocess, sys\n"
        "    exe = os.environ.get('CYBERETHER_PYTHON', 'python3')\n"
        "    try:\n"
        "        extra = json.loads(subprocess.check_output(\n"
        "            [exe, '-c',\n"
        "             'import sys,json;print(json.dumps(sys.path))'],\n"
        "            timeout=20))\n"
        "        sys.path += [p for p in extra if p not in sys.path]\n"
        "    except Exception:\n"
        "        pass\n"
        "    for up in ('.', '..', '../..'):\n"
        "        cand = os.path.abspath(up)\n"
        "        if os.path.isdir(os.path.join(cand,\n"
        "                                      'cyberether_tpu')):\n"
        "            sys.path.insert(0, cand)\n"
        "            break\n");
    g_mod = PyImport_ImportModule("cyberether_tpu.superluminal");
    if (!g_mod) {
        set_err(err, "import cyberether_tpu.superluminal failed");
        PyGILState_Release(gil);
        return false;
    }
    g_np = PyImport_ImportModule("numpy");
    if (!g_np) {
        set_err(err, "import numpy failed");
        PyGILState_Release(gil);
        return false;
    }
    g_inited = true;
    PyGILState_Release(gil);
    return true;
}

bool plot(float* data, std::size_t n, const PlotConfig& cfg,
          bool complex_iq, std::string* err) {
    if (!g_inited && !initialize(err)) return false;
    PyGILState_STATE gil = PyGILState_Ensure();
    bool ok = false;
    PyObject *mv = nullptr, *frombuffer = nullptr, *arr = nullptr,
             *carr = nullptr, *fn = nullptr, *args = nullptr,
             *kw = nullptr, *r = nullptr;
    do {
        const std::size_t nbytes =
            n * sizeof(float) * (complex_iq ? 2 : 1);
        mv = PyMemoryView_FromMemory(reinterpret_cast<char*>(data),
                                     static_cast<Py_ssize_t>(nbytes),
                                     PyBUF_WRITE);
        if (!mv) break;
        frombuffer = PyObject_GetAttrString(g_np, "frombuffer");
        if (!frombuffer) break;
        // zero-copy view over the caller's memory
        arr = PyObject_CallFunction(
            frombuffer, "Os", mv,
            complex_iq ? "complex64" : "float32");
        if (!arr) break;
        const char* type_key =
            cfg.type == Type::Line ? "line"
            : cfg.type == Type::Waterfall ? "waterfall" : "scatter";
        const char* src_key =
            cfg.source == Domain::Time ? "time" : "frequency";
        const char* dsp_key =
            cfg.display == Domain::Time ? "time" : "frequency";
        PyObject* type_c = PyObject_GetAttrString(g_mod, type_key);
        PyObject* src_c = PyObject_GetAttrString(g_mod, src_key);
        PyObject* dsp_c = PyObject_GetAttrString(g_mod, dsp_key);
        fn = PyObject_GetAttrString(g_mod, "plot");
        if (!type_c || !src_c || !dsp_c || !fn) {
            Py_XDECREF(type_c);
            Py_XDECREF(src_c);
            Py_XDECREF(dsp_c);
            break;
        }
        args = PyTuple_Pack(1, arr);
        kw = Py_BuildValue("{s:O,s:(OO),s:s}", "type", type_c,
                           "domain", src_c, dsp_c,
                           "label", cfg.label.c_str());
        Py_DECREF(type_c);
        Py_DECREF(src_c);
        Py_DECREF(dsp_c);
        if (!args || !kw) break;
        r = PyObject_Call(fn, args, kw);
        if (!r) break;
        ok = true;
    } while (false);
    if (!ok) set_err(err, "superluminal.plot failed");
    Py_XDECREF(r);
    Py_XDECREF(kw);
    Py_XDECREF(args);
    Py_XDECREF(fn);
    Py_XDECREF(carr);
    Py_XDECREF(arr);
    Py_XDECREF(frombuffer);
    Py_XDECREF(mv);
    PyGILState_Release(gil);
    return ok;
}

bool start(std::string* err) {
    if (!g_inited && !initialize(err)) return false;
    PyGILState_STATE gil = PyGILState_Ensure();
    bool ok = call0("start", err);
    PyGILState_Release(gil);
    return ok;
}

bool update(std::string* err) {
    PyGILState_STATE gil = PyGILState_Ensure();
    bool ok = call0("update", err);
    PyGILState_Release(gil);
    return ok;
}

bool show(double seconds, std::string* err) {
    if (!g_inited && !initialize(err)) return false;
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* kw = Py_BuildValue("{s:d}", "duration", seconds);
    bool ok = kw && call0("show", err, kw);
    Py_XDECREF(kw);
    PyGILState_Release(gil);
    return ok;
}

bool stop(std::string* err) {
    PyGILState_STATE gil = PyGILState_Ensure();
    bool ok = call0("stop", err);
    PyGILState_Release(gil);
    return ok;
}

void terminate() {
    std::lock_guard<std::mutex> lk(g_mu);
    if (!g_inited) return;
    PyGILState_STATE gil = PyGILState_Ensure();
    call0("terminate", nullptr);
    Py_XDECREF(g_np);
    Py_XDECREF(g_mod);
    g_np = g_mod = nullptr;
    g_inited = false;
    (void)gil;  // leave the interpreter alive for the process
    PyGILState_Release(gil);
}

}  // namespace superluminal
