"""Real (minimal) replacement for codepy.jit: shell out to the toolchain."""
import os
import subprocess


def compile_from_string(toolchain, target, code, src_file=None,
                        cache_dir=None, debug=False, sleep_delay=0,
                        **kwargs):
    if isinstance(code, (list, tuple)):
        code = '\n'.join(code)
    if src_file is None:
        src_file = target + '.c'
    os.makedirs(os.path.dirname(src_file) or '.', exist_ok=True)
    with open(src_file, 'w') as f:
        f.write(code)
    so = target + getattr(toolchain, 'so_ext', '.so')
    if not so.endswith('.so'):
        so = target + '.so'
    cmd = ([toolchain.cc] + list(getattr(toolchain, 'cflags', []))
           + [f'-D{d}' for d in getattr(toolchain, 'defines', [])]
           + [f'-U{u}' for u in getattr(toolchain, 'undefines', [])]
           + [f'-I{d}' for d in getattr(toolchain, 'include_dirs', [])]
           + [src_file, '-o', so]
           + list(getattr(toolchain, 'ldflags', []))
           + [f'-L{d}' for d in getattr(toolchain, 'library_dirs', [])]
           + [f'-l{l}' for l in getattr(toolchain, 'libraries', [])])
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"jit stub compile failed:\n{' '.join(cmd)}\n"
                           f"{res.stderr}")
    return None, None, so, True
