"""Shared test helper: a line-for-line numpy transcription of
openai-whisper's decode-time logit filters (SuppressBlank +
ApplyTimestampRules from openai/whisper decoding.py). Used as the
independent reference implementation in test_timestamp_rules.py and
test_generate_parity.py. NOT a test module."""

import numpy as np

NEG = float(np.finfo(np.float32).min)


def openai_apply(logits: np.ndarray, seqs, *, eot: int, no_ts: int,
                 ts_begin: int, blank: int, max_initial_index: int,
                 suppress_blank: bool) -> np.ndarray:
    """Apply SuppressBlank + ApplyTimestampRules to [B, V] logits given
    each row's sampled-token history `seqs`."""
    out = logits.copy()
    B = out.shape[0]
    for k in range(B):
        seq = seqs[k]
        if suppress_blank and len(seq) == 0:
            out[k, blank] = NEG
            out[k, eot] = NEG
        out[k, no_ts] = NEG
        last_was_ts = len(seq) >= 1 and seq[-1] >= ts_begin
        penult_was_ts = len(seq) < 2 or seq[-2] >= ts_begin
        if last_was_ts:
            if penult_was_ts:
                out[k, ts_begin:] = NEG
            else:
                out[k, :eot] = NEG
        timestamps = [t for t in seq if t >= ts_begin]
        if timestamps:
            if last_was_ts and not penult_was_ts:
                ts_last = timestamps[-1]
            else:
                ts_last = timestamps[-1] + 1
            out[k, ts_begin:ts_last] = NEG
        if len(seq) == 0:
            out[k, :ts_begin] = NEG
            out[k, ts_begin + max_initial_index + 1:] = NEG
        # probability rule: sum of timestamp probs vs max text prob
        row = out[k].astype(np.float64)
        lp = row - (np.max(row)
                    + np.log(np.sum(np.exp(row - np.max(row)))))
        ts_lp = np.logaddexp.reduce(lp[ts_begin:])
        max_text = lp[:ts_begin].max()
        if ts_lp > max_text:
            out[k, :ts_begin] = NEG
    return out
