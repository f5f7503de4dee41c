/* Example C consumer of the native codec (the counterpart of the
 * reference's capi/examples/example.c:1-95): encode a TC128 frame, corrupt
 * it, and decode with both the bit-flip and min-sum decoders using
 * stack-allocated buffers sized by the compile-time macros.
 *
 * Build & run (from native/):
 *     make
 *     cc -O2 -I. examples/example.c -L. -llabrador_ldpc -Wl,-rpath,$PWD -o example
 *     ./example
 */

#include <stdio.h>
#include <string.h>

#include "labrador_ldpc.h"

int main(void) {
    const enum labrador_ldpc_code code = LABRADOR_LDPC_CODE_TC128;

    /* message: k/8 bytes */
    uint8_t data[LABRADOR_LDPC_K(TC128) / 8] = "Hello Tc";

    /* systematic encode into an n/8-byte codeword */
    uint8_t codeword[LABRADOR_LDPC_N(TC128) / 8];
    labrador_ldpc_copy_encode(code, data, codeword);

    /* corrupt three bits of the first byte */
    uint8_t rx[sizeof codeword];
    memcpy(rx, codeword, sizeof codeword);
    rx[0] ^= (1u << 7) | (1u << 5) | (1u << 3);

    /* hard-decision bit-flip decode */
    uint8_t out[LABRADOR_LDPC_OUTPUT_LEN(TC128)];
    uint8_t bf_working[LABRADOR_LDPC_BF_WORKING_LEN(TC128)];
    size_t iters = 0;
    bool ok = labrador_ldpc_decode_bf(code, rx, out, bf_working, 50, &iters);
    printf("decode_bf: ok=%d iters=%zu data_recovered=%d\n", ok, iters,
           memcmp(out, data, sizeof data) == 0);

    /* soft min-sum decode from hard bits via +-1 LLRs */
    float llrs[LABRADOR_LDPC_N(TC128)];
    labrador_ldpc_hard_to_llrs_f32(code, rx, llrs);
    float ms_working[LABRADOR_LDPC_MS_WORKING_LEN(TC128)];
    uint8_t ms_working_u8[LABRADOR_LDPC_MS_WORKING_U8_LEN(TC128)];
    ok = labrador_ldpc_decode_ms_f32(code, llrs, out, ms_working, ms_working_u8, 50,
                                     &iters);
    printf("decode_ms: ok=%d iters=%zu data_recovered=%d\n", ok, iters,
           memcmp(out, data, sizeof data) == 0);
    printf("recovered message: %.8s\n", out);
    return ok ? 0 : 1;
}
