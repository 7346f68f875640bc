"""PG jsonpath evaluation: simple paths, filter expressions, predicates.

Reference surface: the jsonpath operators PG exposes (``@?``,
``jsonb_path_query_first/exists/match``). The reference's own json
module registers zero functions (``datafusion-pg-functions/src/
json.rs:13-15``) — this whole tier is beyond-reference fidelity.

Grammar (the subset real clients use; documented deviations below):

    path      := '$' step*
    step      := '.' member | '[' '*' ']' | '[' int ']'
               | '?' '(' predicate ')'
    predicate := conj ('||' conj)*
    conj      := cmp ('&&' cmp)*
    cmp       := '(' predicate ')' | 'exists' '(' operand ')'
               | operand 'like_regex' string ('flag' string)?
               | operand 'starts' 'with' string
               | operand (op operand)?
    operand   := ('@' | '$') step* | literal
    op        := == != <> < <= > >=
    literal   := number | '...' | "..." | true | false | null

Semantics follow PG's LAX mode: member access auto-unwraps arrays, and
comparisons are EXISTENTIAL (true if any produced pair satisfies the
operator). like_regex is a partial match (PG's ~ semantics) honoring
the i/s/m/x flags; starts with compares string prefixes. Not
implemented: arithmetic inside paths, strict mode, the q flag.

The engine routes to this evaluator (vectorized Pandas UDF) only when
the path contains a filter/predicate; plain member/subscript paths stay
on Spark's codegen ``get_json_object`` fast path.
"""

from __future__ import annotations

import json
import re

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<dq>"(?:[^"\\]|\\.)*")
    | (?P<sq>'(?:[^'\\]|\\.)*')
    | (?P<op>==|!=|<>|<=|>=|\|\||&&|[$@.*\[\]()?<>!])
    | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
    )""", re.VERBOSE)


def _tokenize(p: str) -> list[str]:
    out, i = [], 0
    while i < len(p):
        m = _TOKEN_RE.match(p, i)
        if not m:
            if p[i].isspace():
                i += 1
                continue
            raise ValueError(f"jsonpath syntax error at {p[i:]!r}")
        out.append(m.group(m.lastgroup))
        i = m.end()
    return out


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError(f"jsonpath: expected {t!r}, got {got!r}")

    # ---- steps ----
    def parse_steps(self) -> list:
        steps = []
        while True:
            t = self.peek()
            if t == ".":
                self.next()
                m = self.next()
                if m == "*":
                    steps.append(("wild",))
                else:
                    steps.append(("member", m))
            elif t == "[":
                self.next()
                s = self.next()
                if s == "*":
                    steps.append(("wild",))
                else:
                    steps.append(("index", int(s)))
                self.expect("]")
            elif t == "?":
                self.next()
                self.expect("(")
                steps.append(("filter", self.parse_predicate()))
                self.expect(")")
            else:
                return steps

    # ---- predicates ----
    def parse_predicate(self):
        node = self.parse_conj()
        while self.peek() == "||":
            self.next()
            node = ("or", node, self.parse_conj())
        return node

    def parse_conj(self):
        node = self.parse_cmp()
        while self.peek() == "&&":
            self.next()
            node = ("and", node, self.parse_cmp())
        return node

    def parse_cmp(self):
        t = self.peek()
        if t == "(":
            self.next()
            node = self.parse_predicate()
            self.expect(")")
            return node
        if t == "exists":
            self.next()
            self.expect("(")
            opnd = self.parse_operand()
            self.expect(")")
            return ("exists", opnd)
        left = self.parse_operand()
        op = self.peek()
        if op in ("==", "!=", "<>", "<", "<=", ">", ">="):
            self.next()
            right = self.parse_operand()
            return ("cmp", op, left, right)
        if op == "like_regex":
            self.next()
            pat = self._string_lit()
            flags = ""
            if self.peek() == "flag":
                self.next()
                flags = self._string_lit()
            return ("like_regex", left, pat, flags)
        if op == "starts":
            self.next()
            self.expect("with")
            return ("starts", left, self._string_lit())
        return ("truth", left)

    def _string_lit(self) -> str:
        t = self.next()
        if not t or t[0] not in ("'", '"'):
            raise ValueError(f"jsonpath: expected string literal, got {t!r}")
        return re.sub(r"\\(.)", r"\1", t[1:-1])

    def parse_operand(self):
        t = self.peek()
        if t in ("@", "$"):
            self.next()
            return ("path", t, self.parse_steps())
        t = self.next()
        if t is None:
            raise ValueError("jsonpath: unexpected end")
        if t == "true":
            return ("lit", True)
        if t == "false":
            return ("lit", False)
        if t == "null":
            return ("lit", None)
        if t and (t[0] == '"' or t[0] == "'"):
            body = t[1:-1]
            return ("lit", re.sub(r"\\(.)", r"\1", body))
        try:
            return ("lit", int(t))
        except ValueError:
            return ("lit", float(t))


def _walk(values: list, steps: list) -> list:
    """Apply steps to a list of current values (lax mode)."""
    for step in steps:
        nxt = []
        if step[0] == "member":
            for v in values:
                # lax: auto-unwrap arrays on member access
                items = v if isinstance(v, list) else [v]
                for it in items:
                    if isinstance(it, dict) and step[1] in it:
                        nxt.append(it[step[1]])
        elif step[0] == "index":
            for v in values:
                if isinstance(v, list) and -len(v) <= step[1] < len(v):
                    nxt.append(v[step[1]])
        elif step[0] == "wild":
            for v in values:
                if isinstance(v, list):
                    nxt.extend(v)
                elif isinstance(v, dict):
                    nxt.extend(v.values())
        elif step[0] == "filter":
            for v in values:
                items = v if isinstance(v, list) else [v]
                for it in items:
                    if _eval_pred(step[1], it, values):
                        nxt.append(it)
        values = nxt
    return values


def _operand_values(node, current, root_values) -> tuple[bool, list]:
    """(is_path, values) for a cmp operand."""
    if node[0] == "lit":
        return False, [node[1]]
    _tag, anchor, steps = node
    start = [current] if anchor == "@" else list(root_values)
    return True, _walk(start, steps)


_NUM = (int, float)


def _cmp_one(op: str, a, b) -> bool:
    if a is None or b is None:
        if op == "==":
            return a is None and b is None
        if op in ("!=", "<>"):
            return (a is None) != (b is None)
        return False
    # bools are not numbers in jsonpath
    if isinstance(a, bool) != isinstance(b, bool):
        return op in ("!=", "<>")
    if isinstance(a, _NUM) and isinstance(b, _NUM) and \
            not isinstance(a, bool):
        pass  # comparable
    elif type(a) is not type(b):
        return op in ("!=", "<>")
    if isinstance(a, (dict, list)):
        if op == "==":
            return a == b
        if op in ("!=", "<>"):
            return a != b
        return False
    return {"==": a == b, "!=": a != b, "<>": a != b, "<": a < b,
            "<=": a <= b, ">": a > b, ">=": a >= b}[op]


def _eval_pred(node, current, root_values) -> bool:
    tag = node[0]
    if tag == "or":
        return _eval_pred(node[1], current, root_values) or \
            _eval_pred(node[2], current, root_values)
    if tag == "and":
        return _eval_pred(node[1], current, root_values) and \
            _eval_pred(node[2], current, root_values)
    if tag == "exists":
        _isp, vals = _operand_values(node[1], current, root_values)
        return len(vals) > 0
    if tag == "truth":
        _isp, vals = _operand_values(node[1], current, root_values)
        return any(v is True for v in vals)
    if tag in ("like_regex", "starts"):
        isp, vals = _operand_values(node[1], current, root_values)
        if isp:  # lax: unwrap arrays on the path side
            flat: list = []
            for v in vals:
                flat.extend(v) if isinstance(v, list) else flat.append(v)
            vals = flat
        if tag == "starts":
            return any(isinstance(v, str) and v.startswith(node[2])
                       for v in vals)
        f = 0
        for ch, bit in (("i", re.IGNORECASE), ("s", re.DOTALL),
                        ("m", re.MULTILINE), ("x", re.VERBOSE)):
            if ch in node[3]:
                f |= bit
        try:
            rx = re.compile(node[2], f)
        except re.error:
            return False
        return any(isinstance(v, str) and rx.search(v) for v in vals)
    if tag == "cmp":
        _op, op, left, right = node
        lp, lvals = _operand_values(left, current, root_values)
        rp, rvals = _operand_values(right, current, root_values)
        # lax mode: unwrap arrays on the path side of a comparison
        def unwrap(is_path, vals):
            if not is_path:
                return vals
            out = []
            for v in vals:
                out.extend(v) if isinstance(v, list) else out.append(v)
            return out
        return any(_cmp_one(op, a, b)
                   for a in unwrap(lp, lvals) for b in unwrap(rp, rvals))
    raise ValueError(f"jsonpath: bad predicate node {tag}")


def _parse(p: str):
    toks = _tokenize(p)
    ps = _Parser(toks)
    if ps.peek() in ("@", "$", "(", "exists"):
        node = ps.parse_predicate()
        if ps.i != len(toks):
            raise ValueError("jsonpath: trailing tokens")
        return node
    raise ValueError("jsonpath must start with $")


def query(j: str | None, p: str | None) -> list | None:
    """All matches of path ``p`` in JSON document ``j`` (Python values).
    A predicate-shaped path returns [True/False] like PG's predicate
    check. None on NULL input or invalid JSON (PG raises; we stay
    NULL-quiet like the rest of the json tier)."""
    if j is None or p is None:
        return None
    try:
        doc = json.loads(j)
        node = _parse(p)
    except ValueError:
        return None
    if node[0] == "truth" and node[1][0] == "path":
        # plain path: return matched values
        _tag, anchor, steps = node[1]
        if anchor != "$":
            raise ValueError("jsonpath must be $-rooted at the top level")
        return _walk([doc], steps)
    # predicate form ($.a > 2): single boolean result
    return [_eval_pred(node, doc, [doc])]


def _render(v) -> str | None:
    """get_json_object-compatible rendering: strings raw, scalars as
    JSON text, containers compact."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def query_first(j: str | None, p: str | None) -> str | None:
    vals = query(j, p)
    if not vals:
        return None
    return _render(vals[0])


def query_array(j: str | None, p: str | None) -> str | None:
    """PG jsonb_path_query_array: every match wrapped in one JSON array
    (compact text form)."""
    vals = query(j, p)
    if vals is None:
        return None
    return json.dumps(vals, separators=(",", ":"))


def exists_any(j: str | None, p: str | None) -> bool | None:
    if j is None or p is None:
        return None
    vals = query(j, p)
    if vals is None:
        return None
    return len(vals) > 0


def match_bool(j: str | None, p: str | None) -> bool | None:
    """PG jsonb_path_match: the path must yield a single boolean."""
    vals = query(j, p)
    if not vals or not isinstance(vals[0], bool):
        return None
    return vals[0]
