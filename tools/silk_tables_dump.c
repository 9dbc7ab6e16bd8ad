/* Dumps SILK's normative constant tables (RFC 6716 §4.2) from the
 * reference build to a binary blob consumed by
 * libnyquist_tpu/formats/opus/silk_tables.py. Same dump format as
 * celt_tables_dump.c. Tooling only.
 */
#include <stdio.h>
#include <string.h>
#include "main.h"
#include "tables.h"
#include "structs.h"
#include "pitch_est_defines.h"
#include "resampler_rom.h"

static FILE *g_out;
static void dump(const char *name, const char *dtype, const void *data,
                 int ndims, const int *dims, size_t elem_size) {
    size_t total = 1;
    fprintf(g_out, "%s\n%s\n%d\n", name, dtype, ndims);
    for (int i = 0; i < ndims; i++) {
        fprintf(g_out, "%d\n", dims[i]);
        total *= (size_t)dims[i];
    }
    fwrite(data, elem_size, total, g_out);
    fprintf(g_out, "\n");
}
#define D1(name, dtype, arr, n) do { int d[1] = {n}; dump(name, dtype, arr, 1, d, sizeof((arr)[0])); } while (0)

static void dump_nlsf_cb(const char *prefix, const silk_NLSF_CB_struct *cb) {
    char name[128];
    int d1[1];
    int scal[4] = { cb->nVectors, cb->order, cb->quantStepSize_Q16,
                    cb->invQuantStepSize_Q6 };
    snprintf(name, sizeof name, "%s_scalars", prefix);
    d1[0] = 4; dump(name, "i4", scal, 1, d1, 4);
    snprintf(name, sizeof name, "%s_CB1_NLSF_Q8", prefix);
    d1[0] = cb->nVectors * cb->order;
    dump(name, "u1", cb->CB1_NLSF_Q8, 1, d1, 1);
    snprintf(name, sizeof name, "%s_CB1_iCDF", prefix);
    d1[0] = 2 * cb->nVectors;  /* two signal-type classes */
    dump(name, "u1", cb->CB1_iCDF, 1, d1, 1);
    snprintf(name, sizeof name, "%s_pred_Q8", prefix);
    d1[0] = 2 * (cb->order - 1);
    dump(name, "u1", cb->pred_Q8, 1, d1, 1);
    snprintf(name, sizeof name, "%s_ec_sel", prefix);
    d1[0] = cb->nVectors * cb->order / 2;
    dump(name, "u1", cb->ec_sel, 1, d1, 1);
    snprintf(name, sizeof name, "%s_ec_iCDF", prefix);
    d1[0] = 8 * (2 * NLSF_QUANT_MAX_AMPLITUDE + 1);
    dump(name, "u1", cb->ec_iCDF, 1, d1, 1);
    snprintf(name, sizeof name, "%s_deltaMin_Q15", prefix);
    d1[0] = cb->order + 1;
    dump(name, "i2", cb->deltaMin_Q15, 1, d1, 2);
}

int main(int argc, char **argv) {
    if (argc != 2) { fprintf(stderr, "usage: %s out.tbl\n", argv[0]); return 2; }
    g_out = fopen(argv[1], "wb");
    if (!g_out) return 1;
    int d2[2];

    D1("gain_iCDF", "u1", silk_gain_iCDF[0], 3 * 8);
    D1("delta_gain_iCDF", "u1", silk_delta_gain_iCDF, 41);
    D1("pitch_lag_iCDF", "u1", silk_pitch_lag_iCDF, 32);
    D1("pitch_delta_iCDF", "u1", silk_pitch_delta_iCDF, 21);
    D1("pitch_contour_iCDF", "u1", silk_pitch_contour_iCDF, 34);
    D1("pitch_contour_NB_iCDF", "u1", silk_pitch_contour_NB_iCDF, 11);
    D1("pitch_contour_10ms_iCDF", "u1", silk_pitch_contour_10_ms_iCDF, 12);
    D1("pitch_contour_10ms_NB_iCDF", "u1", silk_pitch_contour_10_ms_NB_iCDF, 3);
    D1("pulses_per_block_iCDF", "u1", silk_pulses_per_block_iCDF[0], 10 * 18);
    D1("rate_levels_iCDF", "u1", silk_rate_levels_iCDF[0], 2 * 9);
    D1("shell_code_table0", "u1", silk_shell_code_table0, 152);
    D1("shell_code_table1", "u1", silk_shell_code_table1, 152);
    D1("shell_code_table2", "u1", silk_shell_code_table2, 152);
    D1("shell_code_table3", "u1", silk_shell_code_table3, 152);
    D1("shell_code_table_offsets", "u1", silk_shell_code_table_offsets, 17);
    D1("lsb_iCDF", "u1", silk_lsb_iCDF, 2);
    D1("sign_iCDF", "u1", silk_sign_iCDF, 42);
    D1("uniform3_iCDF", "u1", silk_uniform3_iCDF, 3);
    D1("uniform4_iCDF", "u1", silk_uniform4_iCDF, 4);
    D1("uniform5_iCDF", "u1", silk_uniform5_iCDF, 5);
    D1("uniform6_iCDF", "u1", silk_uniform6_iCDF, 6);
    D1("uniform8_iCDF", "u1", silk_uniform8_iCDF, 8);
    D1("NLSF_EXT_iCDF", "u1", silk_NLSF_EXT_iCDF, 7);
    D1("LTP_per_index_iCDF", "u1", silk_LTP_per_index_iCDF, 3);
    D1("LTPscale_iCDF", "u1", silk_LTPscale_iCDF, 3);
    D1("LTPScales_table_Q14", "i2", silk_LTPScales_table_Q14, 3);
    D1("type_offset_VAD_iCDF", "u1", silk_type_offset_VAD_iCDF, 4);
    D1("type_offset_no_VAD_iCDF", "u1", silk_type_offset_no_VAD_iCDF, 2);
    D1("stereo_pred_quant_Q13", "i2", silk_stereo_pred_quant_Q13, 16);
    D1("stereo_pred_joint_iCDF", "u1", silk_stereo_pred_joint_iCDF, 25);
    D1("stereo_only_code_mid_iCDF", "u1", silk_stereo_only_code_mid_iCDF, 2);
    D1("LBRR_flags_2_iCDF", "u1", silk_LBRR_flags_iCDF_ptr[0], 3);
    D1("LBRR_flags_3_iCDF", "u1", silk_LBRR_flags_iCDF_ptr[1], 7);
    D1("NLSF_interp_iCDF", "u1", silk_NLSF_interpolation_factor_iCDF, 5);
    D1("Quantization_Offsets_Q10", "i2", silk_Quantization_Offsets_Q10[0], 4);
    D1("LSFCosTab_FIX_Q12", "i2", silk_LSFCosTab_FIX_Q12, 129);

    /* LTP gain codebooks (sizes 8, 16, 32). */
    for (int k = 0; k < NB_LTP_CBKS; k++) {
        char name[64];
        int sz = silk_LTP_vq_sizes[k];
        snprintf(name, sizeof name, "LTP_gain_iCDF_%d", k);
        D1(name, "u1", silk_LTP_gain_iCDF_ptrs[k], sz);
        snprintf(name, sizeof name, "LTP_vq_Q7_%d", k);
        d2[0] = sz; d2[1] = 5;
        dump(name, "i1", silk_LTP_vq_ptrs_Q7[k], 2, d2, 1);
    }

    /* Pitch contour codebooks. */
    d2[0] = PE_MAX_NB_SUBFR; d2[1] = PE_NB_CBKS_STAGE2_EXT;
    dump("CB_lags_stage2", "i1", silk_CB_lags_stage2, 2, d2, 1);
    d2[0] = PE_MAX_NB_SUBFR; d2[1] = PE_NB_CBKS_STAGE3_MAX;
    dump("CB_lags_stage3", "i1", silk_CB_lags_stage3, 2, d2, 1);
    d2[0] = PE_MAX_NB_SUBFR >> 1; d2[1] = PE_NB_CBKS_STAGE2_10MS;
    dump("CB_lags_stage2_10ms", "i1", silk_CB_lags_stage2_10_ms, 2, d2, 1);
    d2[0] = PE_MAX_NB_SUBFR >> 1; d2[1] = PE_NB_CBKS_STAGE3_10MS;
    dump("CB_lags_stage3_10ms", "i1", silk_CB_lags_stage3_10_ms, 2, d2, 1);

    /* NLSF codebooks. */
    dump_nlsf_cb("NLSF_CB_WB", &silk_NLSF_CB_WB);
    dump_nlsf_cb("NLSF_CB_NB_MB", &silk_NLSF_CB_NB_MB);

    /* Resampler ROM. */
    D1("resampler_up2_hq_0", "i2", silk_resampler_up2_hq_0, 3);
    D1("resampler_up2_hq_1", "i2", silk_resampler_up2_hq_1, 3);
    d2[0] = 12; d2[1] = RESAMPLER_ORDER_FIR_12 / 2;
    dump("resampler_frac_FIR_12", "i2", silk_resampler_frac_FIR_12, 2, d2, 2);

    fclose(g_out);
    fprintf(stderr, "wrote %s\n", argv[1]);
    return 0;
}
