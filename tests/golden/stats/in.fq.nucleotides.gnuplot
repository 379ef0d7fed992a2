set output '<OUTDIR>/in.fq.nucleotides.png'
set terminal png nocrop enhanced font arial 10 size 640,360
set ylabel 'Nucleotide content (%)'
set xlabel 'Nucleotide position'
set ytics border in scale 1,0.5 mirror norotate  offset character 0, 0, 0
set title 'Nucleotide Content per Position'
set xrange [ 0 : 59 ] noreverse nowriteback
set autoscale y
set lmargin '10'
set rmargin '4'
set tmargin '3'
set bmargin '4'
plot '<OUTDIR>/in.fq.nucleotides.data' using 1:2 title 'A %' with lines, '<OUTDIR>/in.fq.nucleotides.data' using 1:3 title 'T %' with lines, '<OUTDIR>/in.fq.nucleotides.data' using 1:4 title 'G %' with lines, '<OUTDIR>/in.fq.nucleotides.data' using 1:5 title 'C %' with lines, '<OUTDIR>/in.fq.nucleotides.data' using 1:6 title 'N %' with lines
