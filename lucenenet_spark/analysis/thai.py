"""ThaiAnalyzer: dictionary-segmented Thai runs + stop set.

Reimplements Analysis/Th/ThaiAnalyzer.cs (4.8 path: ThaiTokenizer ->
LowerCase -> Stop). The reference's ThaiTokenizer delegates word
segmentation to the ICU/JDK Thai BreakIterator, whose embedded Thai
dictionary is not shippable in this sandbox; segmentation here is
GREEDY LONGEST MATCH against a user dictionary over the Thai script
runs the UAX#29 tokenizer emits (the same honest-stub policy as the
JapaneseAnalyzer hybrid, and the same override mechanism as a
user-dictionary-backed ThaiWordBreaker). Unmatched spans stay whole
(an un-segmented run still matches itself in queries). Thai has no
case, so LowerCaseFilter only affects embedded Latin. Positions are
token-stream indices; stopped words leave position holes and are
excluded from norm lengths (StopFilter posIncr + FieldInvertState).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.analyzers import StandardAnalyzer

# Analysis/Th/stopwords.txt (the reference's default Thai stop set)
THAI_STOP_WORDS = frozenset("""
ไว้ ไม่ ไป ได้ ให้ ใน โดย แห่ง แล้ว และ แรก แบบ แต่ เอง เห็น เลย
เริ่ม เรา เมื่อ เพื่อ เพราะ เป็นการ เป็น เปิดเผย เปิด เนื่องจาก
เดียวกัน เดียว เช่น เฉพาะ เคย เข้า เขา อีก อาจ อะไร ออก อย่าง อยู่
อยาก หาก หลาย หลังจาก หลัง หรือ หนึ่ง ส่วน ส่ง สุด สําหรับ ว่า วัน
ลง ร่วม ราย รับ ระหว่าง รวม ยัง มี มาก มา พร้อม พบ ผ่าน ผล บาง น่า
นี้ นํา นั้น นัก นอกจาก ทุก ที่สุด ที่ ทําให้ ทํา ทาง ทั้งนี้ ทั้ง
ถ้า ถูก ถึง ต้อง ต่างๆ ต่าง ต่อ ตาม ตั้งแต่ ตั้ง ด้าน ด้วย ดัง
ซึ่ง ช่วง จึง จาก จัด จะ คือ ความ ครั้ง คง ขึ้น ของ ขอ ขณะ ก่อน ก็
การ กับ กัน กว่า กล่าว
""".split())

_TH_LO, _TH_HI = 0x0E00, 0x0E7F


def _is_thai(tok: str) -> bool:
    return bool(tok) and all(_TH_LO <= ord(c) <= _TH_HI for c in tok)


class ThaiAnalyzer(StandardAnalyzer):
    """Analysis/Th/ThaiAnalyzer.cs analogue (see module docstring)."""

    def __init__(self, user_dict=(), stopwords=THAI_STOP_WORDS, **kw):
        kw.setdefault("stopwords", None)   # stop AFTER segmentation
        super().__init__(**kw)
        self.th_stopwords = frozenset(stopwords or ())
        self.user_dict = frozenset(user_dict)
        self._max_word = max((len(w) for w in self.user_dict), default=0)

    def _segment(self, run: str) -> list[str]:
        out: list[str] = []
        i, n = 0, len(run)
        unk = -1
        while i < n:
            best = 0
            for length in range(min(self._max_word, n - i), 0, -1):
                if run[i:i + length] in self.user_dict:
                    best = length
                    break
            if best:
                if unk >= 0:
                    out.append(run[unk:i])
                    unk = -1
                out.append(run[i:i + best])
                i += best
            else:
                if unk < 0:
                    unk = i
                i += 1
        if unk >= 0:
            out.append(run[unk:])
        return out

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, field_lens = super().tokenize_batch(texts)
        n_rows = len(texts)
        out_r: list[int] = []
        out_t: list[str] = []
        out_p: list[int] = []
        lens = np.zeros(n_rows, dtype=np.int32)
        cur_row, cur_pos = -1, 0
        for r, t in zip(row_idx, terms):
            if r != cur_row:
                cur_row, cur_pos = r, 0
            words = self._segment(t) if _is_thai(t) else [t]
            for w in words:
                if w in self.th_stopwords:
                    cur_pos += 1        # position hole, no norm count
                    continue
                out_r.append(r)
                out_t.append(w)
                out_p.append(cur_pos)
                cur_pos += 1
                lens[r] += 1
        return (
            np.asarray(out_r, dtype=np.int64),
            np.asarray(out_t, dtype=object),
            np.asarray(out_p, dtype=np.int32),
            lens,
        )

    def tokenize_batch_arrow(self, texts):  # pragma: no cover - explicit
        raise NotImplementedError("segmentation uses the pandas batch API")

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False
