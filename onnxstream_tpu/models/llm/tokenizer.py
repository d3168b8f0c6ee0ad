"""SentencePiece-score BPE tokenizer (reference src/llm.cpp:223-340).

vocab.txt format: one `score,token` per line; the line number is the id.
Byte tokens `<0xNN>` become single chars. Encoding: greedy highest-score merge
of adjacent tokens; special tokens are matched longest-first before the
char-level seed. Chat templates: chatml (TinyLlama) and [INST] (Mistral)
(reference src/llm.cpp:465-467).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple


class SentencePieceBPE:
    def __init__(self, tokens: List[Tuple[int, str]], special: Optional[List[str]] = None):
        """tokens: list of (score, token_text) in id order."""
        self.idx2token: List[Tuple[int, str]] = list(tokens)
        self.token2idx: Dict[str, int] = {t: i for i, (s, t) in enumerate(self.idx2token)}
        self.special_ids: List[int] = []
        for s in special or []:
            if s not in self.token2idx:
                # TinyLlama appends [PAD]/<|im_start|>/<|im_end|> past the file
                # vocab (reference llm.cpp:264-275)
                self.token2idx[s] = len(self.idx2token)
                self.idx2token.append((0, s))
            self.special_ids.append(self.token2idx[s])

    @classmethod
    def from_file(cls, path: str, special: Optional[List[str]] = None, is_tiny: bool = False):
        tokens: List[Tuple[int, str]] = []
        with open(path, encoding="utf-8", errors="surrogateescape") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                comma = line.find(",")
                if comma == -1:
                    raise ValueError(f"invalid vocab line: {line[:50]!r}")
                score = int(line[:comma])
                token = line[comma + 1 :]
                if len(token) == 6 and token.startswith("<0x") and token.endswith(">"):
                    token = chr(int(token[3:5], 16) & 0xFF)
                tokens.append((score, token))
        sp = list(special or [])
        if is_tiny:
            sp = ["[PAD]", "<|im_start|>", "<|im_end|>"] + sp
        sp += ["<s>", "</s>"]
        return cls(tokens, sp)

    def encode(self, s: str) -> List[int]:
        """Greedy score-BPE (reference llm.cpp:288-340)."""
        r: List[int] = []
        i = 0
        while i < len(s):
            matched = False
            for j in self.special_ids:
                t = self.idx2token[j][1]
                if t and s.startswith(t, i):
                    r.append(j)
                    i += len(t)
                    matched = True
                    break
            if matched:
                continue
            idx = self.token2idx.get(s[i])
            if idx is None:
                raise ValueError(f"character {s[i]!r} not in vocab (unicode bytes not present)")
            r.append(idx)
            i += 1

        while True:
            best_score = None
            best_id = -1
            best_k = -1
            for k in range(len(r) - 1):
                merged = self.idx2token[r[k]][1] + self.idx2token[r[k + 1]][1]
                idx = self.token2idx.get(merged)
                if idx is not None and (best_score is None or self.idx2token[idx][0] > best_score):
                    best_score = self.idx2token[idx][0]
                    best_id = idx
                    best_k = k
            if best_k == -1:
                break
            r[best_k] = best_id
            del r[best_k + 1]
        return r

    def decode_token(self, idx: int) -> str:
        return self.idx2token[idx][1]


def chat_template(prompt: str, is_tiny: bool, continuing: bool) -> str:
    """chatml for TinyLlama, [INST] for Mistral (reference llm.cpp:465-467)."""
    if is_tiny:
        return ("<|im_end|>\n" if continuing else "") + f"<|im_start|>user\n{prompt}<|im_end|>\n<|im_start|>assistant\n"
    return ("</s>" if continuing else "<s>") + f"[INST] {prompt} [/INST]"
