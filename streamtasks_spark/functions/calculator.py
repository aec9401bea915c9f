"""Calculator expression language → Spark Column / SQL / Python.

Reimplements the reference's lark-based formula language
(/root/reference/streamtasks/system/tasks/calculator.py:17-64 grammar,
:106-134 eval semantics) as a dependency-free recursive-descent parser with
three compile targets:

  * ``compile_column``  → pyspark.sql.Column (JVM-side, whole-stage codegen;
    no Python UDF in the hot path)
  * ``compile_sql``     → ANSI SQL text (used to auto-generate the DuckDB
    oracle for calculator queries)
  * ``evaluate``        → float (pure-Python oracle for unit tests, mirrors
    the reference's CalculatorEvalContext)

Semantics preserved exactly (reference fidelity):
  * booleans are floats; truthy ⇔ value > 0.5 (calculator.py:103)
  * logical ops &,|,^,! operate on >0.5 and return 1.0/0.0
  * comparisons return 1.0/0.0
  * ``c ? a : b`` ternary
  * ``%`` is Python modulo (sign of divisor), not C fmod
  * ``round`` is Python round (banker's / half-even)
  * ``**`` is LEFT-associative (grammar rule ``exp: exp "**" atom``)
  * constants pi, e; functions sin..atanh, atan2, log, log2, log10, exp,
    sqrt, floor, ceil, round, abs, min, max (variadic)

Precedence, loosest→tightest (matching the reference grammar):
  ternary < comparison < (& | ^) < (+ -) < (* / %) < ** < unary/atom
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][-+]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>\*\*|>=|<=|==|!=|[-+*/%()><&|^!?:,]))"
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    pos, out = 0, []
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"calculator: bad token at {pos!r} in {text!r}")
        pos = m.end()
        for kind in ("num", "name", "op"):
            val = m.group(kind)
            if val is not None:
                out.append((kind, val))
                break
    out.append(("end", ""))
    return out


# ---------------------------------------------------------------------- AST


@dataclass(frozen=True)
class Num:
    value: float


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Unary:
    op: str  # '-', '+', '!'
    operand: Any


@dataclass(frozen=True)
class Binary:
    op: str  # + - * / % ** & | ^ > < >= <= == !=
    left: Any
    right: Any


@dataclass(frozen=True)
class Ternary:
    cond: Any
    if_true: Any
    if_false: Any


@dataclass(frozen=True)
class Func:
    name: str
    args: tuple


_FUNCS_1 = {
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
    "asinh", "acosh", "atanh", "log", "log2", "log10", "exp", "sqrt",
    "floor", "ceil", "round", "abs",
}
_FUNCS_N = {"min", "max", "atan2"}
CONSTANTS = {"pi": math.pi, "e": math.e}


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, op: str) -> None:
        kind, val = self.next()
        if kind != "op" or val != op:
            raise ValueError(f"calculator: expected {op!r}, got {val!r}")

    def parse(self) -> Any:
        node = self.expr()
        if self.peek()[0] != "end":
            raise ValueError(f"calculator: trailing input {self.peek()[1]!r}")
        return node

    def expr(self) -> Any:  # ternary, right-assoc
        cond = self.comparison()
        if self.peek() == ("op", "?"):
            self.next()
            a = self.expr()
            self.expect(":")
            b = self.expr()
            return Ternary(cond, a, b)
        return cond

    def comparison(self) -> Any:
        node = self.logical()
        while self.peek()[0] == "op" and self.peek()[1] in (">", "<", ">=", "<=", "==", "!="):
            op = self.next()[1]
            node = Binary(op, node, self.logical())
        return node

    def logical(self) -> Any:
        node = self.addsub()
        while self.peek()[0] == "op" and self.peek()[1] in ("&", "|", "^"):
            op = self.next()[1]
            node = Binary(op, node, self.addsub())
        return node

    def addsub(self) -> Any:
        node = self.muldiv()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = Binary(op, node, self.muldiv())
        return node

    def muldiv(self) -> Any:
        node = self.power()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            node = Binary(op, node, self.power())
        return node

    def power(self) -> Any:  # left-assoc per reference grammar
        node = self.unary()
        while self.peek() == ("op", "**"):
            self.next()
            node = Binary("**", node, self.unary())
        return node

    def unary(self) -> Any:
        kind, val = self.peek()
        if kind == "op" and val in ("-", "+", "!"):
            self.next()
            return Unary(val, self.unary())
        return self.atom()

    def atom(self) -> Any:
        kind, val = self.next()
        if kind == "num":
            return Num(float(val))
        if kind == "name":
            if self.peek() == ("op", "("):
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.expr())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.expr())
                self.expect(")")
                fname = val.lower()
                if fname not in _FUNCS_1 | _FUNCS_N:
                    raise ValueError(f"calculator: unknown function {val!r}")
                if fname in _FUNCS_1 and len(args) != 1:
                    raise ValueError(f"calculator: {val} takes 1 arg")
                return Func(fname, tuple(args))
            return Var(val)
        if kind == "op" and val == "(":
            node = self.expr()
            self.expect(")")
            return node
        raise ValueError(f"calculator: unexpected {val!r}")


def parse(expr: str) -> Any:
    """Parse a calculator expression to an AST."""
    return _Parser(_tokenize(expr)).parse()


def variable_names(expr: str) -> set[str]:
    """Free variables of the expression (excluding pi/e), for input binding
    — the reference's CalculatorNameExtractor (calculator.py:137-151)."""
    out: set[str] = set()

    def walk(n: Any) -> None:
        if isinstance(n, Var) and n.name not in CONSTANTS:
            out.add(n.name)
        elif isinstance(n, Unary):
            walk(n.operand)
        elif isinstance(n, Binary):
            walk(n.left)
            walk(n.right)
        elif isinstance(n, Ternary):
            walk(n.cond)
            walk(n.if_true)
            walk(n.if_false)
        elif isinstance(n, Func):
            for a in n.args:
                walk(a)

    walk(parse(expr))
    return out


# ------------------------------------------------------- backend: pyspark


def _col_bool(c: Column) -> Column:
    return c > F.lit(0.5)


def compile_column(expr: str, resolver: Callable[[str], Column] | dict[str, Column]) -> Column:
    """Compile to a pyspark Column. `resolver` maps variable name → Column
    (dict or callable). Stays entirely JVM-side: arithmetic, F.when, math
    functions — no Python UDF, so whole-stage codegen applies."""
    if isinstance(resolver, dict):
        rmap = resolver
        resolver = lambda n: rmap[n]  # noqa: E731

    def num(c: Column) -> Column:
        return c.cast("double")

    def b2f(cond: Column) -> Column:
        return F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))

    def go(n: Any) -> Column:
        if isinstance(n, Num):
            return F.lit(n.value)
        if isinstance(n, Var):
            if n.name in CONSTANTS:
                return F.lit(CONSTANTS[n.name])
            return resolver(n.name).cast("double")
        if isinstance(n, Unary):
            x = go(n.operand)
            if n.op == "-":
                return -x
            if n.op == "+":
                return x
            return F.when(_col_bool(x), F.lit(0.0)).otherwise(F.lit(1.0))
        if isinstance(n, Ternary):
            return F.when(_col_bool(go(n.cond)), go(n.if_true)).otherwise(go(n.if_false))
        if isinstance(n, Binary):
            a, b = go(n.left), go(n.right)
            if n.op == "+":
                return a + b
            if n.op == "-":
                return a - b
            if n.op == "*":
                return a * b
            if n.op == "/":
                return a / b
            if n.op == "%":
                # python modulo: sign of divisor
                return ((a % b) + b) % b
            if n.op == "**":
                return F.pow(a, b)
            if n.op == "&":
                return b2f(_col_bool(a) & _col_bool(b))
            if n.op == "|":
                return b2f(_col_bool(a) | _col_bool(b))
            if n.op == "^":
                return b2f(_col_bool(a) != _col_bool(b))
            cmp = {
                ">": a > b, "<": a < b, ">=": a >= b,
                "<=": a <= b, "==": a == b, "!=": a != b,
            }[n.op]
            return b2f(cmp)
        if isinstance(n, Func):
            args = [go(a) for a in n.args]
            f1 = {
                "sin": F.sin, "cos": F.cos, "tan": F.tan, "asin": F.asin,
                "acos": F.acos, "atan": F.atan, "sinh": F.sinh,
                "cosh": F.cosh, "tanh": F.tanh, "exp": F.exp,
                "sqrt": F.sqrt, "log10": F.log10, "log2": F.log2,
                "abs": F.abs,
            }
            if n.name in f1:
                return num(f1[n.name](args[0]))
            if n.name == "log":
                return F.log(args[0])
            if n.name == "asinh":
                return F.asinh(args[0])
            if n.name == "acosh":
                return F.acosh(args[0])
            if n.name == "atanh":
                return F.atanh(args[0])
            if n.name == "atan2":
                return F.atan2(args[0], args[1])
            if n.name == "floor":
                return num(F.floor(args[0]))
            if n.name == "ceil":
                return num(F.ceil(args[0]))
            if n.name == "round":
                # python round = half-even; F.bround matches
                return num(F.bround(args[0], 0))
            if n.name == "min":
                return F.least(*args) if len(args) > 1 else args[0]
            if n.name == "max":
                return F.greatest(*args) if len(args) > 1 else args[0]
            raise ValueError(f"calculator: unhandled function {n.name}")
        raise TypeError(f"calculator: bad node {n!r}")

    return go(parse(expr)).cast("double")


# ----------------------------------------------------------- backend: SQL


def compile_sql(expr: str, resolver: Callable[[str], str] | dict[str, str]) -> str:
    """Compile to SQL text runnable by DuckDB (and mostly Spark SQL).
    Used to generate oracle SQL mechanically from the same expression that
    built the Spark plan — one source of truth for both sides."""
    if isinstance(resolver, dict):
        rmap = resolver
        resolver = lambda n: rmap[n]  # noqa: E731

    def bool_(s: str) -> str:
        return f"({s} > 0.5)"

    def b2f(cond: str) -> str:
        return f"(CASE WHEN {cond} THEN 1.0 ELSE 0.0 END)"

    def go(n: Any) -> str:
        if isinstance(n, Num):
            return repr(n.value)
        if isinstance(n, Var):
            if n.name in CONSTANTS:
                return repr(CONSTANTS[n.name])
            return f"CAST({resolver(n.name)} AS DOUBLE)"
        if isinstance(n, Unary):
            x = go(n.operand)
            if n.op == "-":
                return f"(- {x})"
            if n.op == "+":
                return x
            return f"(CASE WHEN {bool_(x)} THEN 0.0 ELSE 1.0 END)"
        if isinstance(n, Ternary):
            return (
                f"(CASE WHEN {bool_(go(n.cond))} THEN {go(n.if_true)} "
                f"ELSE {go(n.if_false)} END)"
            )
        if isinstance(n, Binary):
            a, b = go(n.left), go(n.right)
            if n.op in ("+", "-", "*", "/"):
                return f"({a} {n.op} {b})"
            if n.op == "%":
                return f"(fmod(fmod({a}, {b}) + {b}, {b}))"
            if n.op == "**":
                return f"power({a}, {b})"
            if n.op == "&":
                return b2f(f"{bool_(a)} AND {bool_(b)}")
            if n.op == "|":
                return b2f(f"{bool_(a)} OR {bool_(b)}")
            if n.op == "^":
                return b2f(f"{bool_(a)} <> {bool_(b)}")
            op = {"==": "=", "!=": "<>"}.get(n.op, n.op)
            return b2f(f"{a} {op} {b}")
        if isinstance(n, Func):
            args = [go(a) for a in n.args]
            if n.name == "round":
                return f"round_even({args[0]}, 0)"  # duckdb half-even
            if n.name == "log":
                return f"ln({args[0]})"
            # duckdb has no hyperbolic builtins — expand to exponentials
            if n.name == "sinh":
                x = args[0]
                return f"((exp({x}) - exp(- {x})) / 2.0)"
            if n.name == "cosh":
                x = args[0]
                return f"((exp({x}) + exp(- {x})) / 2.0)"
            if n.name == "tanh":
                x = args[0]
                return f"((exp(2.0 * {x}) - 1.0) / (exp(2.0 * {x}) + 1.0))"
            # nor inverse-hyperbolic — expand to logs
            if n.name == "asinh":
                x = args[0]
                return f"ln({x} + sqrt({x} * {x} + 1.0))"
            if n.name == "acosh":
                x = args[0]
                return f"ln({x} + sqrt({x} * {x} - 1.0))"
            if n.name == "atanh":
                x = args[0]
                return f"(0.5 * ln((1.0 + {x}) / (1.0 - {x})))"
            if n.name == "min":
                return f"least({', '.join(args)})" if len(args) > 1 else args[0]
            if n.name == "max":
                return f"greatest({', '.join(args)})" if len(args) > 1 else args[0]
            if n.name in ("floor", "ceil"):
                return f"CAST({n.name}({args[0]}) AS DOUBLE)"
            return f"{n.name}({', '.join(args)})"
        raise TypeError(f"calculator: bad node {n!r}")

    return f"CAST({go(parse(expr))} AS DOUBLE)"


# -------------------------------------------------------- backend: python


def evaluate(expr: str, variables: dict[str, float] | None = None) -> float:
    """Pure-Python evaluation — the unit-test oracle, mirroring the
    reference's CalculatorEvalContext/Transformer semantics exactly."""
    env = dict(variables or {})

    def go(n: Any) -> float:
        if isinstance(n, Num):
            return n.value
        if isinstance(n, Var):
            if n.name in CONSTANTS:
                return CONSTANTS[n.name]
            return float(env[n.name])
        if isinstance(n, Unary):
            x = go(n.operand)
            if n.op == "-":
                return -x
            if n.op == "+":
                return x
            return 0.0 if x > 0.5 else 1.0
        if isinstance(n, Ternary):
            return go(n.if_true) if go(n.cond) > 0.5 else go(n.if_false)
        if isinstance(n, Binary):
            a = go(n.left)
            b = go(n.right)
            if n.op == "+":
                return a + b
            if n.op == "-":
                return a - b
            if n.op == "*":
                return a * b
            if n.op == "/":
                return a / b
            if n.op == "%":
                return a % b
            if n.op == "**":
                return a**b
            if n.op == "&":
                return 1.0 if a > 0.5 and b > 0.5 else 0.0
            if n.op == "|":
                return 1.0 if a > 0.5 or b > 0.5 else 0.0
            if n.op == "^":
                return 1.0 if (a > 0.5) != (b > 0.5) else 0.0
            return 1.0 if {
                ">": a > b, "<": a < b, ">=": a >= b,
                "<=": a <= b, "==": a == b, "!=": a != b,
            }[n.op] else 0.0
        if isinstance(n, Func):
            args = [go(a) for a in n.args]
            if n.name == "round":
                return float(round(args[0]))
            if n.name == "min":
                return float(min(args))
            if n.name == "max":
                return float(max(args))
            if n.name == "abs":
                return abs(args[0])
            return float(getattr(math, n.name)(*args))
        raise TypeError(f"bad node {n!r}")

    return float(go(parse(expr)))
