/* labrador_ldpc_tpu native C API
 *
 * Host-side scalar codec for the nine CCSDS LDPC codes, C-callable.
 * This is the framework's counterpart of the reference crate's C FFI
 * (reference: capi/src/lib.rs:15-179, capi/include/labrador_ldpc.h:19-115):
 * the same capability surface — size getters, systematic encode, bit-flip /
 * min-sum decoders over caller-provided buffers, hard<->LLR converters per
 * LLR type — re-implemented in C++ for hosted targets. The TPU (JAX) path
 * is the production batch engine; this library serves single-codeword and
 * embedded-adjacent consumers plus differential testing.
 *
 * Conventions match the reference:
 *   - bytes are MSB-first bit order
 *   - LLR sign: positive = bit 0 more likely; hard bit 1 = negative LLR
 *   - decode outputs are (n+p)/8 bytes; the first k/8 bytes are the data
 *   - decoders return true on success and write the 0-based convergence
 *     iteration through iters_run (maxiters on failure)
 *
 * Note: the reference's header defines N for TM6144 as 6140 and spells the
 * TM6144 macros "..._TM6140" (capi/include/labrador_ldpc.h:52,76,88,100,112);
 * those are upstream bugs and are NOT reproduced here.
 */

#ifndef LABRADOR_LDPC_TPU_NATIVE_H
#define LABRADOR_LDPC_TPU_NATIVE_H

#include <stdbool.h>
#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

enum labrador_ldpc_code {
    LABRADOR_LDPC_CODE_TC128 = 0,
    LABRADOR_LDPC_CODE_TC256 = 1,
    LABRADOR_LDPC_CODE_TC512 = 2,
    LABRADOR_LDPC_CODE_TM1280 = 3,
    LABRADOR_LDPC_CODE_TM1536 = 4,
    LABRADOR_LDPC_CODE_TM2048 = 5,
    LABRADOR_LDPC_CODE_TM5120 = 6,
    LABRADOR_LDPC_CODE_TM6144 = 7,
    LABRADOR_LDPC_CODE_TM8192 = 8,
};

/* ---- compile-time sizes (reference: capi/include/labrador_ldpc.h:42-115) */

#define LABRADOR_LDPC_N_TC128 128
#define LABRADOR_LDPC_N_TC256 256
#define LABRADOR_LDPC_N_TC512 512
#define LABRADOR_LDPC_N_TM1280 1280
#define LABRADOR_LDPC_N_TM1536 1536
#define LABRADOR_LDPC_N_TM2048 2048
#define LABRADOR_LDPC_N_TM5120 5120
#define LABRADOR_LDPC_N_TM6144 6144
#define LABRADOR_LDPC_N_TM8192 8192
#define LABRADOR_LDPC_N(CODE) LABRADOR_LDPC_N_##CODE

#define LABRADOR_LDPC_K_TC128 64
#define LABRADOR_LDPC_K_TC256 128
#define LABRADOR_LDPC_K_TC512 256
#define LABRADOR_LDPC_K_TM1280 1024
#define LABRADOR_LDPC_K_TM1536 1024
#define LABRADOR_LDPC_K_TM2048 1024
#define LABRADOR_LDPC_K_TM5120 4096
#define LABRADOR_LDPC_K_TM6144 4096
#define LABRADOR_LDPC_K_TM8192 4096
#define LABRADOR_LDPC_K(CODE) LABRADOR_LDPC_K_##CODE

/* working length for decode_bf: n + p bytes */
#define LABRADOR_LDPC_BF_WORKING_LEN_TC128 128
#define LABRADOR_LDPC_BF_WORKING_LEN_TC256 256
#define LABRADOR_LDPC_BF_WORKING_LEN_TC512 512
#define LABRADOR_LDPC_BF_WORKING_LEN_TM1280 1408
#define LABRADOR_LDPC_BF_WORKING_LEN_TM1536 1792
#define LABRADOR_LDPC_BF_WORKING_LEN_TM2048 2560
#define LABRADOR_LDPC_BF_WORKING_LEN_TM5120 5632
#define LABRADOR_LDPC_BF_WORKING_LEN_TM6144 7168
#define LABRADOR_LDPC_BF_WORKING_LEN_TM8192 10240
#define LABRADOR_LDPC_BF_WORKING_LEN(CODE) LABRADOR_LDPC_BF_WORKING_LEN_##CODE

/* working length for decode_ms, in LLR-type units:
 * 2*E + 3n + 3p - 2k  (reference: src/decoder.rs:100-102) */
#define LABRADOR_LDPC_MS_WORKING_LEN_TC128 1280
#define LABRADOR_LDPC_MS_WORKING_LEN_TC256 2560
#define LABRADOR_LDPC_MS_WORKING_LEN_TC512 5120
#define LABRADOR_LDPC_MS_WORKING_LEN_TM1280 12160
#define LABRADOR_LDPC_MS_WORKING_LEN_TM1536 15104
#define LABRADOR_LDPC_MS_WORKING_LEN_TM2048 20992
#define LABRADOR_LDPC_MS_WORKING_LEN_TM5120 48640
#define LABRADOR_LDPC_MS_WORKING_LEN_TM6144 60416
#define LABRADOR_LDPC_MS_WORKING_LEN_TM8192 83968
#define LABRADOR_LDPC_MS_WORKING_LEN(CODE) LABRADOR_LDPC_MS_WORKING_LEN_##CODE

/* u8 working length for decode_ms: (n + p - k) / 8 */
#define LABRADOR_LDPC_MS_WORKING_U8_LEN_TC128 8
#define LABRADOR_LDPC_MS_WORKING_U8_LEN_TC256 16
#define LABRADOR_LDPC_MS_WORKING_U8_LEN_TC512 32
#define LABRADOR_LDPC_MS_WORKING_U8_LEN_TM1280 48
#define LABRADOR_LDPC_MS_WORKING_U8_LEN_TM1536 96
#define LABRADOR_LDPC_MS_WORKING_U8_LEN_TM2048 192
#define LABRADOR_LDPC_MS_WORKING_U8_LEN_TM5120 192
#define LABRADOR_LDPC_MS_WORKING_U8_LEN_TM6144 384
#define LABRADOR_LDPC_MS_WORKING_U8_LEN_TM8192 768
#define LABRADOR_LDPC_MS_WORKING_U8_LEN(CODE) LABRADOR_LDPC_MS_WORKING_U8_LEN_##CODE

/* decoder output length: (n + p) / 8 bytes */
#define LABRADOR_LDPC_OUTPUT_LEN_TC128 16
#define LABRADOR_LDPC_OUTPUT_LEN_TC256 32
#define LABRADOR_LDPC_OUTPUT_LEN_TC512 64
#define LABRADOR_LDPC_OUTPUT_LEN_TM1280 176
#define LABRADOR_LDPC_OUTPUT_LEN_TM1536 224
#define LABRADOR_LDPC_OUTPUT_LEN_TM2048 320
#define LABRADOR_LDPC_OUTPUT_LEN_TM5120 704
#define LABRADOR_LDPC_OUTPUT_LEN_TM6144 896
#define LABRADOR_LDPC_OUTPUT_LEN_TM8192 1280
#define LABRADOR_LDPC_OUTPUT_LEN(CODE) LABRADOR_LDPC_OUTPUT_LEN_##CODE

/* ---- runtime size getters (reference: capi/src/lib.rs:15-66) ---- */

size_t labrador_ldpc_code_n(enum labrador_ldpc_code code);
size_t labrador_ldpc_code_k(enum labrador_ldpc_code code);
size_t labrador_ldpc_punctured_bits(enum labrador_ldpc_code code);
size_t labrador_ldpc_paritycheck_sum(enum labrador_ldpc_code code);
size_t labrador_ldpc_bf_working_len(enum labrador_ldpc_code code);
size_t labrador_ldpc_ms_working_len(enum labrador_ldpc_code code);
size_t labrador_ldpc_ms_working_u8_len(enum labrador_ldpc_code code);
size_t labrador_ldpc_output_len(enum labrador_ldpc_code code);

/* ---- encode (reference: capi/src/lib.rs:26-44) ----
 * codeword: n/8 bytes; encode() reads the data from its first k/8 bytes,
 * copy_encode() copies data (k/8 bytes) in first. */
void labrador_ldpc_encode(enum labrador_ldpc_code code, uint8_t *codeword);
void labrador_ldpc_copy_encode(enum labrador_ldpc_code code, const uint8_t *data,
                               uint8_t *codeword);

/* ---- decoders (reference: capi/src/lib.rs:69-127) ----
 * input:   n/8 bytes (hard) or n LLRs (soft)
 * output:  output_len bytes
 * working: bf_working_len bytes / ms_working_len LLR units + u8 area
 * iters_run: may be NULL. */
bool labrador_ldpc_decode_bf(enum labrador_ldpc_code code, const uint8_t *input,
                             uint8_t *output, uint8_t *working, size_t max_iters,
                             size_t *iters_run);
bool labrador_ldpc_decode_ms_i8(enum labrador_ldpc_code code, const int8_t *llrs,
                                uint8_t *output, int8_t *working, uint8_t *working_u8,
                                size_t max_iters, size_t *iters_run);
bool labrador_ldpc_decode_ms_i16(enum labrador_ldpc_code code, const int16_t *llrs,
                                 uint8_t *output, int16_t *working, uint8_t *working_u8,
                                 size_t max_iters, size_t *iters_run);
bool labrador_ldpc_decode_ms_f32(enum labrador_ldpc_code code, const float *llrs,
                                 uint8_t *output, float *working, uint8_t *working_u8,
                                 size_t max_iters, size_t *iters_run);
bool labrador_ldpc_decode_ms_f64(enum labrador_ldpc_code code, const double *llrs,
                                 uint8_t *output, double *working, uint8_t *working_u8,
                                 size_t max_iters, size_t *iters_run);

/* ---- hard <-> LLR converters (reference: capi/src/lib.rs:136-179) ---- */
void labrador_ldpc_hard_to_llrs_i8(enum labrador_ldpc_code code, const uint8_t *input,
                                   int8_t *llrs);
void labrador_ldpc_hard_to_llrs_i16(enum labrador_ldpc_code code, const uint8_t *input,
                                    int16_t *llrs);
void labrador_ldpc_hard_to_llrs_f32(enum labrador_ldpc_code code, const uint8_t *input,
                                    float *llrs);
void labrador_ldpc_hard_to_llrs_f64(enum labrador_ldpc_code code, const uint8_t *input,
                                    double *llrs);
void labrador_ldpc_llrs_to_hard_i8(enum labrador_ldpc_code code, const int8_t *llrs,
                                   uint8_t *output);
void labrador_ldpc_llrs_to_hard_i16(enum labrador_ldpc_code code, const int16_t *llrs,
                                    uint8_t *output);
void labrador_ldpc_llrs_to_hard_f32(enum labrador_ldpc_code code, const float *llrs,
                                    uint8_t *output);
void labrador_ldpc_llrs_to_hard_f64(enum labrador_ldpc_code code, const double *llrs,
                                    uint8_t *output);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* LABRADOR_LDPC_TPU_NATIVE_H */
