class Toolchain:
    def __init__(self, *a, **k):
        for key, v in k.items():
            setattr(self, key, v)
    def copy(self):
        import copy
        return copy.copy(self)

class GCCToolchain(Toolchain):
    cc = 'gcc'
    cflags = []
    ldflags = []
    libraries = []
    include_dirs = []
    library_dirs = []
    defines = []
    undefines = []
    so_ext = '.so'
    o_ext = '.o'

def guess_toolchain():
    return GCCToolchain()

def call_capture_output(*a, **k):
    return 0, b'', b''
