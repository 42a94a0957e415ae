"""Minimal anytree stand-in (enough for devito's stree)."""

class NodeMixin:
    _parent = None
    _children = None

    @property
    def parent(self):
        return self._parent

    @parent.setter
    def parent(self, value):
        if self._parent is value:
            return
        if self._parent is not None and self in self._parent._kids():
            self._parent._kids().remove(self)
        self._parent = value
        if value is not None:
            value._kids().append(self)

    def _kids(self):
        if self._children is None:
            self._children = []
        return self._children

    @property
    def children(self):
        return tuple(self._children or ())

    @children.setter
    def children(self, value):
        for c in list(self._children or ()):
            c.parent = None
        for c in value:
            c.parent = self

    @property
    def ancestors(self):
        out = []
        p = self._parent
        while p is not None:
            out.append(p)
            p = p._parent
        return tuple(reversed(out))

    @property
    def root(self):
        n = self
        while n._parent is not None:
            n = n._parent
        return n

    @property
    def siblings(self):
        if self._parent is None:
            return ()
        return tuple(c for c in self._parent.children if c is not self)

    @property
    def leaves(self):
        out = []
        def _walk(n):
            if not n.children:
                out.append(n)
            for c in n.children:
                _walk(c)
        _walk(self)
        return tuple(out)

    @property
    def descendants(self):
        out = []
        def _walk(n):
            for c in n.children:
                out.append(c)
                _walk(c)
        _walk(self)
        return tuple(out)

    @property
    def depth(self):
        return len(self.ancestors)

    @property
    def height(self):
        if not self.children:
            return 0
        return 1 + max(c.height for c in self.children)


def PostOrderIter(node):
    for c in node.children:
        yield from PostOrderIter(c)
    yield node


def PreOrderIter(node):
    yield node
    for c in node.children:
        yield from PreOrderIter(c)


class ContStyle:
    pass


def RenderTree(node, style=None):
    rows = []
    def _walk(n, pre):
        rows.append((pre, None, n))
        for c in n.children:
            _walk(c, pre + '  ')
    _walk(node, '')
    class _RT(list):
        def __iter__(self):
            return iter(rows)
    return _RT()

def findall(node, filter_=None, **k):
    out = []
    for n in PreOrderIter(node):
        if filter_ is None or filter_(n):
            out.append(n)
    return tuple(out)
