"""Build the reference paffy/faffy binaries against the sonLib shim.

The reference snapshot can't build as-is (its sonLib submodule is not
checked out, /root/reference/.gitmodules:1-3); the shim in this directory
implements exactly the surface paffy consumes (SURVEY.md section 2.5), so
the real reference algorithms — chaining tiebreaks, tile ordering, trim
arithmetic, tag emission — compile and run unmodified for differential
testing (tests/test_reference_diff.py).

The reference tree is read-only; sources are compiled out-of-tree into a
content-addressed cache directory, so repeat test runs reuse the binaries.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import shutil
import subprocess

HERE = pathlib.Path(__file__).resolve().parent
REFERENCE = pathlib.Path("/root/reference")
CACHE_ROOT = pathlib.Path(
    os.environ.get("PAFFY_REFBUILD_CACHE",
                   os.path.expanduser("~/.cache/paffy_refbuild")))

CFLAGS = ["-O2", "-g", "-std=gnu11", "-UNDEBUG", "-fcommon", "-w"]
CXXFLAGS = ["-O2", "-g", "-std=c++17", "-UNDEBUG", "-w"]


def _content_key() -> str:
    h = hashlib.sha256()
    for path in sorted(list((REFERENCE / "impl").glob("*.c"))
                       + list((REFERENCE / "inc").glob("*.h"))
                       + [REFERENCE / "paffy_main.c",
                          REFERENCE / "faffy_main.c"]
                       + sorted(HERE.glob("*.h")) + sorted(HERE.glob("*.cpp"))
                       + [HERE / "build.py"]):
        h.update(path.name.encode())
        h.update(path.read_bytes())
    return h.hexdigest()[:16]


def build_reference(verbose: bool = False) -> dict[str, str] | None:
    """Compile the reference against the shim; returns {'paffy': path,
    'faffy': path} or None when no toolchain / no reference is available."""
    if shutil.which("gcc") is None or shutil.which("g++") is None:
        return None
    if not (REFERENCE / "impl").is_dir():
        return None
    out_dir = CACHE_ROOT / _content_key()
    paffy, faffy = out_dir / "ref_paffy", out_dir / "ref_faffy"
    if paffy.exists() and faffy.exists():
        return {"paffy": str(paffy), "faffy": str(faffy)}

    build = out_dir / "build"
    build.mkdir(parents=True, exist_ok=True)
    inc = [f"-I{REFERENCE / 'inc'}", f"-I{HERE}"]

    objs = []
    cfiles = sorted((REFERENCE / "impl").glob("*.c")) + [
        REFERENCE / "paffy_main.c", REFERENCE / "faffy_main.c"]
    for src in cfiles:
        obj = build / (src.stem + ".o")
        cmd = ["gcc", *CFLAGS, *inc, "-c", str(src), "-o", str(obj)]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            if verbose:
                print(f"FAILED: {' '.join(cmd)}\n{r.stderr}")
            return None
        objs.append(obj)
    shim_obj = build / "sonlib_shim.o"
    r = subprocess.run(["g++", *CXXFLAGS, *inc, "-c",
                        str(HERE / "sonlib_shim.cpp"), "-o", str(shim_obj)],
                       capture_output=True, text=True)
    if r.returncode != 0:
        if verbose:
            print(f"shim compile FAILED:\n{r.stderr}")
        return None

    lib = [str(o) for o in objs if o.stem not in ("paffy_main", "faffy_main")]
    for main, out in (("paffy_main", paffy), ("faffy_main", faffy)):
        r = subprocess.run(
            ["g++", "-o", str(out), str(build / f"{main}.o"), *lib,
             str(shim_obj), "-lm"],
            capture_output=True, text=True)
        if r.returncode != 0:
            if verbose:
                print(f"link {main} FAILED:\n{r.stderr}")
            return None
    return {"paffy": str(paffy), "faffy": str(faffy)}


if __name__ == "__main__":
    res = build_reference(verbose=True)
    print(res if res else "build failed")
