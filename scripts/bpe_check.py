#!/usr/bin/env python3
"""Independent BPE reference (Sennrich et al. 2016, arXiv:1508.07909) for
pinning the engine's BpeTokenizer goldens.

Deliberately a DIFFERENT algorithm from the engine on both sides:
 - training re-counts pairs with a dict comprehension per round (the
   paper's reference style), tie-break (count desc, pair asc);
 - encoding applies merges IN RANK ORDER, replacing all occurrences of
   each pair before moving to the next rank — the engine instead scans
   for the lowest-rank adjacent pair per round. The two are equivalent
   for BPE by construction; if either implementation is buggy the golden
   comparison in BpeTokenizerSpec fails.

Usage: python3 bpe_check.py           # prints merges + encodings for the
                                      # spec's fixture corpus
"""
import sys


def learn(dict_items, n_merges):
    words = {tuple(list(w) + ['</w>']): f for w, f in dict_items}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        joined = pair[0] + pair[1]
        new_words = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


def encode(word, merges):
    syms = list(word) + ['</w>']
    for pair in merges:               # rank order, all occurrences
        joined = pair[0] + pair[1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(joined)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


FIXTURE = [
    ('lower', 5), ('lowest', 3), ('newer', 6), ('wider', 2), ('new', 4),
]

if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    merges = learn(FIXTURE, n)
    print('merges =', merges)
    for w, _ in FIXTURE:
        print(w, '->', encode(w, merges))
    # vocab id assignment mirror: chars + </w> + merge products, sorted,
    # ids from 1 (0 = UNK)
    symbols = sorted(set(c for w, _ in FIXTURE for c in w)
                     | {'</w>'} | {a + b for a, b in merges})
    vocab = {s: i + 1 for i, s in enumerate(symbols)}
    print('vocab =', vocab)
    for w, _ in FIXTURE:
        print(w, 'ids ->', [vocab[s] for s in encode(w, merges)])
