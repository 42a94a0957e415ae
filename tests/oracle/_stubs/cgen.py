"""Minimal clean-room implementation of the ``cgen`` C-source-AST API
(public interface only) — just enough for the reference Devito checkout at
/root/reference to generate and JIT its C kernels, so our tests can use it
as a *numerical oracle*.

This is NOT part of devito_tpu. It exists only so parity tests can execute
the reference implementation side by side when a checkout is available.
"""

import numpy as np

__all__ = [
    'Generable', 'Declarator', 'Value', 'Pointer', 'ArrayOf', 'POD',
    'FunctionDeclaration', 'Struct', 'AlignedAttribute', 'Initializer',
    'Template', 'Block', 'Collection', 'Module', 'Statement', 'Assign',
    'Line', 'Comment', 'MultilineComment', 'Define', 'Include', 'Pragma',
    'If', 'For', 'While', 'FunctionBody', 'Extern', 'IfNDef',
    'dtype_to_ctype',
]


def dtype_to_ctype(dtype):
    dtype = np.dtype(dtype)
    mapper = {
        'float16': '_Float16', 'float32': 'float', 'float64': 'double',
        'int8': 'char', 'int16': 'short', 'int32': 'int', 'int64': 'long',
        'uint8': 'unsigned char', 'uint16': 'unsigned short',
        'uint32': 'unsigned int', 'uint64': 'unsigned long',
        'bool': 'bool', 'complex64': 'float _Complex',
        'complex128': 'double _Complex',
    }
    try:
        return mapper[dtype.name]
    except KeyError:
        raise ValueError(f"unsupported dtype {dtype}")


class Generable:
    """A node that can emit lines of C source."""

    def generate(self, with_semicolon=True):
        raise NotImplementedError

    def __str__(self):
        return "\n".join(line.rstrip() for line in self.generate())


# -- declarators ----------------------------------------------------------

class Declarator(Generable):
    """A node that declares something: yields type lines + a declared name."""

    def get_decl_pair(self):
        """Return ([type lines], declared-name-or-None)."""
        raise NotImplementedError

    def generate(self, with_semicolon=True):
        tp_lines, tp_decl = self.get_decl_pair()
        tp_lines = list(tp_lines)
        for line in tp_lines[:-1]:
            yield line
        sc = ";" if with_semicolon else ""
        if tp_decl is None:
            yield f"{tp_lines[-1]}{sc}"
        else:
            yield f"{tp_lines[-1]} {tp_decl}{sc}"

    def inline(self, with_semicolon=False):
        tp_lines, tp_decl = self.get_decl_pair()
        tp = " ".join(tp_lines)
        sc = ";" if with_semicolon else ""
        if tp_decl is None:
            return f"{tp}{sc}"
        return f"{tp} {tp_decl}{sc}"


class Value(Declarator):
    def __init__(self, typename, name):
        self.typename = typename
        self.name = name

    def get_decl_pair(self):
        return [self.typename], self.name


class POD(Value):
    def __init__(self, dtype, name):
        super().__init__(dtype_to_ctype(dtype), name)


class NestedDeclarator(Declarator):
    def __init__(self, subdecl):
        self.subdecl = subdecl

    @property
    def name(self):
        return self.subdecl.name

    @property
    def typename(self):
        return self.subdecl.typename

    def get_decl_pair(self):
        return self.subdecl.get_decl_pair()


class Pointer(NestedDeclarator):
    def get_decl_pair(self):
        sub_tp, sub_decl = self.subdecl.get_decl_pair()
        return sub_tp, f"*{sub_decl}"


class ArrayOf(NestedDeclarator):
    def __init__(self, subdecl, count=None):
        super().__init__(subdecl)
        self.count = count

    def get_decl_pair(self):
        sub_tp, sub_decl = self.subdecl.get_decl_pair()
        n = "" if self.count is None else str(self.count)
        return sub_tp, f"{sub_decl}[{n}]"


class FunctionDeclaration(NestedDeclarator):
    def __init__(self, subdecl, arg_decls):
        super().__init__(subdecl)
        self.arg_decls = list(arg_decls)

    def get_decl_pair(self):
        sub_tp, sub_decl = self.subdecl.get_decl_pair()
        args = ", ".join(ad.inline() for ad in self.arg_decls)
        return sub_tp, f"{sub_decl}({args})"


class AlignedAttribute(NestedDeclarator):
    def __init__(self, align_bytes, subdecl):
        super().__init__(subdecl)
        self.align_bytes = align_bytes

    def get_decl_pair(self):
        sub_tp, sub_decl = self.subdecl.get_decl_pair()
        return sub_tp, (f"{sub_decl} "
                        f"__attribute__((aligned({self.align_bytes})))")


class Initializer(Generable):
    def __init__(self, vdecl, data):
        self.vdecl = vdecl
        self.data = data

    def generate(self, with_semicolon=True):
        tp_lines, tp_decl = self.vdecl.get_decl_pair()
        tp_lines = list(tp_lines)
        for line in tp_lines[:-1]:
            yield line
        sc = ";" if with_semicolon else ""
        yield f"{tp_lines[-1]} {tp_decl} = {self.data}{sc}"


class Struct(Declarator):
    def __init__(self, tpname, fields, declname=None):
        self.tpname = tpname
        self.fields = list(fields)
        self.declname = declname

    def get_decl_pair(self):
        lines = []
        if self.tpname is not None:
            lines.append(f"struct {self.tpname}")
        else:
            lines.append("struct")
        lines.append("{")
        for f in self.fields:
            for f_line in f.generate():
                lines.append("  " + f_line)
        lines.append("}")
        return lines, self.declname


class Template(Generable):
    def __init__(self, template_spec, subdecl):
        self.template_spec = template_spec
        self.subdecl = subdecl

    def generate(self, with_semicolon=False):
        yield f"template <{self.template_spec}>"
        yield from self.subdecl.generate(with_semicolon=with_semicolon)


# -- statements & structure ----------------------------------------------

class Statement(Generable):
    def __init__(self, text):
        self.text = text

    def generate(self, with_semicolon=True):
        yield f"{self.text};"


class Assign(Generable):
    def __init__(self, lvalue, rvalue):
        self.lvalue = lvalue
        self.rvalue = rvalue

    def generate(self, with_semicolon=True):
        yield f"{self.lvalue} = {self.rvalue};"


class Line(Generable):
    def __init__(self, text=""):
        self.text = text

    def generate(self, with_semicolon=True):
        yield self.text


class Comment(Generable):
    def __init__(self, text):
        self.text = text

    def generate(self, with_semicolon=True):
        yield f"/* {self.text} */"


class MultilineComment(Generable):
    def __init__(self, text):
        self.text = text

    def generate(self, with_semicolon=True):
        yield "/*"
        for line in self.text.splitlines():
            yield f" * {line}"
        yield " */"


class Define(Generable):
    def __init__(self, symbol, value):
        self.symbol = symbol
        self.value = value

    def generate(self, with_semicolon=True):
        yield f"#define {self.symbol} {self.value}"


class Include(Generable):
    def __init__(self, filename, system=True):
        self.filename = filename
        self.system = system

    def generate(self, with_semicolon=True):
        if self.system:
            yield f"#include <{self.filename}>"
        else:
            yield f"#include \"{self.filename}\""


class Pragma(Generable):
    def __init__(self, value):
        self.value = value

    def generate(self, with_semicolon=True):
        yield f"#pragma {self.value}"


class Block(Generable):
    def __init__(self, contents=()):
        self.contents = list(contents)

    def generate(self, with_semicolon=True):
        yield "{"
        for item in self.contents:
            for line in item.generate():
                yield "  " + line
        yield "}"


class Collection(Generable):
    def __init__(self, contents=()):
        self.contents = list(contents)

    def generate(self, with_semicolon=True):
        for item in self.contents:
            yield from item.generate()


class Module(Collection):
    pass


class Extern(Collection):
    def __init__(self, language, contents=()):
        super().__init__(contents)
        self.language = language

    def generate(self, with_semicolon=True):
        yield f'extern "{self.language}"'
        yield "{"
        for item in self.contents:
            yield from item.generate()
        yield "}"


class IfNDef(Generable):
    """#ifndef guard: emit ``iflines``, else ``elselines``."""

    def __init__(self, symbol, iflines, elselines=()):
        self.symbol = symbol
        self.iflines = list(iflines)
        self.elselines = list(elselines)

    def generate(self, with_semicolon=True):
        yield f"#ifndef {self.symbol}"
        for item in self.iflines:
            yield from item.generate()
        if self.elselines:
            yield "#else"
            for item in self.elselines:
                yield from item.generate()
        yield "#endif"


def _gen_maybe_block(item):
    if isinstance(item, Block):
        yield from item.generate()
    else:
        for line in item.generate():
            yield "  " + line


class If(Generable):
    def __init__(self, condition, then_, else_=None):
        self.condition = condition
        self.then_ = then_
        self.else_ = else_

    def generate(self, with_semicolon=True):
        yield f"if ({self.condition})"
        yield from _gen_maybe_block(self.then_)
        if self.else_ is not None:
            yield "else"
            yield from _gen_maybe_block(self.else_)


class For(Generable):
    def __init__(self, start, condition, update, body):
        self.start = start
        self.condition = condition
        self.update = update
        self.body = body

    def generate(self, with_semicolon=True):
        yield f"for ({self.start}; {self.condition}; {self.update})"
        yield from _gen_maybe_block(self.body)


class While(Generable):
    def __init__(self, condition, body):
        self.condition = condition
        self.body = body

    def generate(self, with_semicolon=True):
        yield f"while ({self.condition})"
        yield from _gen_maybe_block(self.body)


class FunctionBody(Generable):
    def __init__(self, fdecl, body):
        self.fdecl = fdecl
        self.body = body

    def generate(self, with_semicolon=True):
        yield from self.fdecl.generate(with_semicolon=False)
        yield from self.body.generate()
