"""Stemmers for the analyzer extension point.

- ``porter_stem`` — the Porter algorithm exactly as the reference's
  PorterStemFilter applies it (analysis/common/.../en/PorterStemmer.java:
  110-440, Martin Porter's Release 3 with the Bug 1/Bug 2 guards and
  the Lucene rule table: step3 includes bli->ble and logi->log).
  Words of length <= 2 (k <= k0+1) are returned unchanged.
- ``english_minimal_stem`` — the S-stemmer
  (analysis/common/.../en/EnglishMinimalStemmer.java:27-45, Harman's
  "How Effective Is Suffixing?"): plural-only, trivially expressible
  in SQL, which is why the driver-checked stemmed gate uses it.

Both operate on already-lowercased tokens (they sit after
LowerCaseFilter in the chain, like the reference filters).
"""
from __future__ import annotations

_VOWELS = frozenset("aeiou")


class _Porter:
    """Index-for-index restatement of PorterStemmer.java's buffer
    algorithm (b, j, k, k0) so every boundary quirk matches."""

    __slots__ = ("b", "j", "k")

    def __init__(self, word: str):
        self.b = list(word)
        self.j = 0
        self.k = len(word) - 1

    def cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        n, i, j = 0, 0, self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) \
                or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        o = self.k - len(s) + 1
        if o < 0:
            return False
        if self.b[o:o + len(s)] != list(s):
            return False
        self.j = self.k - len(s)
        return True

    def setto(self, s: str):
        o = self.j + 1
        self.b[o:o + len(s)] = list(s)
        self.k = self.j + len(s)

    def r(self, s: str):
        if self.m() > 0:
            self.setto(s)

    def step1(self):
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowelinstem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step2(self):
        if self.ends("y") and self.vowelinstem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"),
              ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
              ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def step3(self):
        if self.k == 0:
            return  # Bug 1 guard
        for suf, rep in self._STEP3.get(self.b[self.k - 1], ()):
            if self.ends(suf):
                self.r(rep)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def step4(self):
        for suf, rep in self._STEP4.get(self.b[self.k], ()):
            if self.ends(suf):
                self.r(rep)
                return

    _STEP5 = {
        "a": ("al",), "c": ("ance", "ence"), "e": ("er",), "i": ("ic",),
        "l": ("able", "ible"), "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",), "t": ("ate", "iti"), "u": ("ous",),
        "v": ("ive",), "z": ("ize",),
    }

    def step5(self):
        if self.k == 0:
            return  # Bug 1 guard
        ch = self.b[self.k - 1]
        if ch == "o":
            if not ((self.ends("ion") and self.j >= 0
                     and self.b[self.j] in ("s", "t"))
                    or self.ends("ou")):
                return
        else:
            for suf in self._STEP5.get(ch, ()):
                if self.ends(suf):
                    break
            else:
                return
        if self.m() > 1:
            self.k = self.j

    def step6(self):
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1


def porter_stem(word: str) -> str:
    k = len(word) - 1
    if k <= 1:  # k > k0+1 gate in stem(int)
        return word
    p = _Porter(word)
    p.step1()
    p.step2()
    p.step3()
    p.step4()
    p.step5()
    p.step6()
    return "".join(p.b[: p.k + 1])


def english_minimal_stem(word: str) -> str:
    n = len(word)
    if n < 3 or word[-1] != "s":
        return word
    c = word[-2]
    if c in ("u", "s"):
        return word
    if c == "e":
        if n > 3 and word[-3] == "i" and word[-4] not in ("a", "e"):
            return word[:-3] + "y"
        if word[-3] in ("i", "a", "o", "e"):
            return word
        return word[:-1]
    return word[:-1]
