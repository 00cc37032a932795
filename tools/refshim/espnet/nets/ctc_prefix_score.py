"""ESPnet-compatible CTC prefix scorer for the parity harness.

The reference imports ``espnet.nets.ctc_prefix_score.CTCPrefixScore``
(sequence_generator.py:16) but espnet isn't installed here, so this shim
provides a faithful implementation of the standard CTC prefix-scoring
recurrence (Watanabe et al., "Hybrid CTC/Attention Architecture"): per
prefix g, r_n(t) / r_b(t) are the probabilities of emitting g by frame t
with the last emission at t (non-blank) or followed by blanks, and the
candidate score psi(g+c) accumulates phi(t-1)+x_t(c).

Only used by tests (tools/refshim is never imported by the framework).
"""

import numpy as np


class CTCPrefixScore:
    """Compute CTC label-sequence scores, one utterance at a time.

    x: (T, V) log-probabilities of the CTC lattice.
    """

    def __init__(self, x, blank, eos, xp=np):
        self.xp = xp
        self.logzero = -10000000000.0
        self.blank = blank
        self.eos = eos
        self.input_length = len(x)
        self.odim = x.shape[1]
        self.x = x

    def initial_state(self):
        """r_b for the empty prefix: all-blank paths."""
        r = np.full((self.input_length, 2), self.logzero, dtype=np.float32)
        r[0, 1] = self.x[0, self.blank]
        for i in range(1, self.input_length):
            r[i, 1] = r[i - 1, 1] + self.x[i, self.blank]
        return r

    def __call__(self, y, cs, r_prev):
        """Score extending prefix ``y`` (y[0] is sos) with candidates ``cs``.

        Returns (log_psi (len(cs),), new states (len(cs), T, 2))."""
        xp = self.xp
        output_length = len(y) - 1  # exclude sos
        cs = np.asarray(cs)
        r = np.ndarray((self.input_length, 2, len(cs)), dtype=np.float32)
        xs = self.x[:, cs]
        if output_length == 0:
            r[0, 0] = xs[0]
            r[0, 1] = self.logzero
        else:
            # prefix of length n can't end before frame n
            r[output_length - 1] = self.logzero

        # phi = prob of prefix y at t, usable before emitting a NEW label;
        # when c == last label of y, only the blank-terminated part counts
        r_sum = np.logaddexp(r_prev[:, 0], r_prev[:, 1])
        last = y[-1]
        if output_length > 0 and last in cs:
            log_phi = np.ndarray((self.input_length, len(cs)), dtype=np.float32)
            for i in range(len(cs)):
                log_phi[:, i] = r_prev[:, 1] if cs[i] == last else r_sum
        else:
            log_phi = np.tile(r_sum[..., None], (1, len(cs))).astype(np.float32)

        start = max(output_length, 1)
        log_psi = r[start - 1, 0]
        for t in range(start, self.input_length):
            r[t, 0] = np.logaddexp(r[t - 1, 0], log_phi[t - 1]) + xs[t]
            r[t, 1] = (
                np.logaddexp(r[t - 1, 0], r[t - 1, 1]) + self.x[t, self.blank]
            )
            log_psi = np.logaddexp(log_psi, log_phi[t - 1] + xs[t])

        # EOS scores the COMPLETE prefix probability
        eos_pos = np.where(cs == self.eos)[0]
        if len(eos_pos) > 0:
            log_psi[eos_pos] = r_sum[-1]

        return log_psi, np.rollaxis(r, 2)


class CTCPrefixScoreTH:
    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "batched espnet scorer: the reference only uses CTCPrefixScore"
        )
