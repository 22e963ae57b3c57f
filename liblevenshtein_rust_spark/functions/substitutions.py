"""Restricted (zero-cost) character substitutions.

Mirrors the reference's SubstitutionSet / Restricted policy
(/root/reference/src/transducer/substitution_set.rs,
substitution_policy.rs): whitelisted character pairs count as EQUAL
(cost 0) during matching, e.g. with f~p allowed, "fone" matches "phone"
at distance 1 (only the missing 'h' costs an edit).

Engine integration:
- scoring: the banded DP's equality test becomes
  (a == b) or ((a, b) in pairs)  — exact reference semantics.
- blocking: keys are generated over CLASS-CANONICALIZED text (each char
  replaced by the representative of its substitution class, a union-find
  over the pair graph). Class collapse can only shrink distances, so the
  blocked candidate set is a superset of the true match set — recall-safe;
  the exact pair-set DP then scores precisely.

Presets carry a representative sample of the reference's preset pair
families (phonetic_basic / keyboard_qwerty / leet_speak / ocr_friendly,
substitution_set.rs:536-616).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _symmetrize(pairs) -> frozenset[tuple[str, str]]:
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return frozenset(out)


@dataclass(frozen=True)
class SubstitutionSet:
    """Symmetric set of zero-cost character substitutions."""

    pairs: frozenset = field(default_factory=frozenset)

    @classmethod
    def of(cls, *pairs: tuple[str, str]) -> "SubstitutionSet":
        return cls(_symmetrize(pairs))

    # presets (pair families following the reference's presets)
    @classmethod
    def phonetic_basic(cls) -> "SubstitutionSet":
        return cls.of(("f", "p"), ("c", "k"), ("s", "z"), ("i", "y"),
                      ("g", "j"), ("c", "s"))

    @classmethod
    def keyboard_qwerty(cls) -> "SubstitutionSet":
        rows = ["qwertyuiop", "asdfghjkl", "zxcvbnm"]
        pairs = []
        for row in rows:
            pairs += [(row[i], row[i + 1]) for i in range(len(row) - 1)]
        return cls.of(*pairs)

    @classmethod
    def leet_speak(cls) -> "SubstitutionSet":
        return cls.of(("3", "e"), ("@", "a"), ("0", "o"), ("1", "l"),
                      ("5", "s"), ("7", "t"), ("4", "a"), ("$", "s"))

    @classmethod
    def ocr_friendly(cls) -> "SubstitutionSet":
        return cls.of(("0", "o"), ("1", "l"), ("1", "i"), ("5", "s"),
                      ("8", "b"), ("2", "z"), ("6", "b"), ("c", "e"))

    def codepoint_pairs(self) -> frozenset[tuple[int, int]]:
        return frozenset((ord(a), ord(b)) for a, b in self.pairs)

    def class_map(self) -> dict[str, str]:
        """char -> representative of its substitution class (union-find
        over the pair graph; representative = min char). Used only for
        blocking-key canonicalization (recall-safe superset)."""
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in self.pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        return {c: find(c) for c in parent if c != find(c)}

    def translate_args(self) -> tuple[str, str]:
        """(from_chars, to_chars) for F.translate-based canonicalization."""
        m = self.class_map()
        src = "".join(m.keys())
        dst = "".join(m.values())
        return src, dst
